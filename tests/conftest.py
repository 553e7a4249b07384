"""Pytest configuration.

Tests run on the JAX CPU backend with 8 virtual devices so the distributed
tier (tier 4, SURVEY.md §4.5) can exercise real meshes/psum without TPU
hardware. Set YABPE_TEST_TPU=1 to run the suite on the real chip instead.
"""

from __future__ import annotations

import os
import pickle
import sys
from pathlib import Path

# Land the suite on an 8-device virtual CPU mesh. In the sandbox the axon
# (TPU) PJRT plugin registers *eagerly* at interpreter startup, so
# JAX_PLATFORMS=cpu set here would be a silent no-op for backend selection.
# Instead: force the CPU client to 8 devices (it initializes lazily, so the
# flag still applies), make CPU the default placement device, and tell the
# library via YABPE_BACKEND to build meshes / pick kernels for CPU.
if os.environ.get("YABPE_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"  # honored when no eager TPU plugin
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["YABPE_BACKEND"] = "cpu"

    # Compile-cache hermeticity guard (VERDICT r4 #1). XLA:CPU cache
    # entries are machine-feature-specific; this sandbox restarts onto
    # hosts with different CPU features, and a stale shared cache dir has
    # SEGFAULTED inside jax's compilation_cache get/put mid-suite. Even a
    # per-host-fingerprinted dir (jaxsetup.machine_fingerprint) draws
    # "machine type doesn't match" warnings from jax's load path on THIS
    # host, so the CPU tier runs with the persistent cache OFF entirely —
    # correctness evidence must not depend on cross-session cache state.
    # (The TPU tier keeps its cache: axon entries are service-compiled
    # and portable.) Export YABPE_COMPILE_CACHE=1 to override.
    os.environ.setdefault("YABPE_COMPILE_CACHE", "0")

    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tinystories_5m() -> Path:
    """The regenerated 5 MB TinyStories-style corpus (built on demand)."""
    path = REPO / "tests" / "fixtures_gpt2" / "tinystories_sample_5M.txt"
    if not path.exists():
        sample = (
            Path("/root/reference/tests/fixtures_gpt2/tinystories_sample.txt")
            .read_text(encoding="utf-8")
        )
        reps = (5 * 1024 * 1024) // len(sample.encode("utf-8")) + 1
        with open(path, "w", encoding="utf-8") as f:
            for _ in range(reps):
                f.write(sample)
    return path


class Snapshot:
    """Pickle-based snapshot assertion helper (tests/_snapshots)."""

    def __init__(self, test_name: str) -> None:
        self.dir = REPO / "tests" / "_snapshots"
        self.dir.mkdir(exist_ok=True)
        self.test_name = test_name

    def assert_match(self, actual, test_name: str | None = None) -> None:
        name = test_name or self.test_name
        path = self.dir / f"{name}.pkl"
        if os.environ.get("YABPE_SNAPSHOT_UPDATE") == "1" or not path.exists():
            with open(path, "wb") as f:
                pickle.dump(actual, f)
            return
        with open(path, "rb") as f:
            expected = pickle.load(f)
        if isinstance(actual, dict):
            for key, value in actual.items():
                assert key in expected, f"key {key!r} missing from snapshot {name}"
                assert value == expected[key], f"snapshot mismatch for {key!r}"
        else:
            assert actual == expected, f"snapshot mismatch for {name}"


@pytest.fixture
def snapshot(request) -> Snapshot:
    return Snapshot(request.node.name)
