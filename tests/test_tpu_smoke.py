"""Always-on, stall-tolerant on-chip smoke tier.

The default suite runs on the virtual CPU mesh (tests/conftest.py), which
left the real-TPU path with ZERO default coverage: the only on-chip test
was env-gated behind YABPE_TEST_TPU=1, and a wedged PJRT tunnel would hang
it forever.  This tier runs a <64-merge fused-kernel + HBM-kernel training
in a SUBPROCESS whenever a TPU is reachable, with a two-stage hard
timeout:

* stage 1 — the child must report its backend within
  ``YABPE_TPU_SMOKE_PROBE_S`` (default 90 s).  A dead tunnel (where even
  ``jax.devices()`` hangs) becomes a skip-with-reason, not a hang.
* stage 2 — the full run (possibly a cold kernel compile) must finish
  within ``YABPE_TPU_SMOKE_TIMEOUT_S`` (default 900 s).

Reference behavior mirrored: the reference's conformance gate runs
unconditionally (/root/reference/tests/test_train_bpe_gpt2.py:27-62); this
is its on-chip analogue. Disable explicitly with YABPE_TPU_SMOKE=0.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import sys, time
sys.path.insert(0, %(src)r)
import jax

backend = jax.default_backend()
print(f"BACKEND {backend}", flush=True)
if backend == "cpu":
    print("NOTPU", flush=True)
    sys.exit(0)
devs = jax.devices()
print(f"DEVICES {devs}", flush=True)

from collections import Counter

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.train import state as train_state
from yabpe_tpu.train.fused_driver import run_fused_merge_loop
from yabpe_tpu.train.hbm_driver import run_hbm_merge_loop
from yabpe_tpu.train.reference_loop import train_merges_oracle

counter = Counter()
for i in range(400):
    counter[f" ab{i %% 31}x{i %% 7}".encode()] = (i %% 13) + 1
base = Vocab.base([])
wt = WordTable.from_counter(counter)
_, want = train_merges_oracle(counter, [], 320, 1)

t0 = time.perf_counter()
ids = run_fused_merge_loop(
    wt, base, vocab_cap=320, num_merges=64, min_frequency=1, chunk_size=16
)
t_fused = time.perf_counter() - t0
_, merges = train_state.merges_to_bytes(ids, base)
assert merges == want[:64], "fused kernel merges diverge on-chip"

t0 = time.perf_counter()
ids = run_hbm_merge_loop(
    wt, base, vocab_cap=320, num_merges=64, min_frequency=1, chunk_size=16
)
t_hbm = time.perf_counter() - t0
_, merges = train_state.merges_to_bytes(ids, base)
assert merges == want[:64], "HBM kernel merges diverge on-chip"

# replay/emission kernel (the sharded-composition building block):
# compiled-vs-interpreter byte equality on the real chip
import numpy as np
import jax.numpy as jnp
from yabpe_tpu.train.hbm_driver import pack_words
from yabpe_tpu.kernels.replay_emit import replay_emit_chunk

packed = jnp.asarray(pack_words(wt))
chain = np.full((4, 128), -1, np.int32)
for j in range(3):
    chain[j, :3] = ids[j]
t0 = time.perf_counter()
outs = {}
for interp in (False, True):
    outs[interp] = replay_emit_chunk(
        packed, jnp.asarray(chain), word_width=max(wt.width, 2),
        cps=64, cps0=128, interpret=interp,
    )
for x, y in zip(outs[False], outs[True]):
    assert (np.asarray(x) == np.asarray(y)).all(), "replay_emit diverges"
t_re = time.perf_counter() - t0

print(f"OK fused={t_fused:.1f}s hbm={t_hbm:.1f}s replay_emit={t_re:.1f}s",
      flush=True)
"""


@pytest.mark.chip
def test_tpu_smoke_always_on():
    if os.environ.get("YABPE_TPU_SMOKE", "1") == "0":
        pytest.skip("disabled via YABPE_TPU_SMOKE=0")
    probe_s = float(os.environ.get("YABPE_TPU_SMOKE_PROBE_S", "90"))
    total_s = float(os.environ.get("YABPE_TPU_SMOKE_TIMEOUT_S", "900"))

    env = dict(os.environ)
    # The suite conftest pins this process to the CPU backend; the child
    # must see the real default environment so the TPU plugin wins.
    for var in ("JAX_PLATFORMS", "YABPE_BACKEND", "XLA_FLAGS"):
        env.pop(var, None)

    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD % {"src": str(REPO / "src")}],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        env=env,
        text=True,
    )
    t0 = time.monotonic()
    lines: list[str] = []
    saw_backend = False
    try:
        import selectors

        sel = selectors.DefaultSelector()
        sel.register(child.stdout, selectors.EVENT_READ)
        buf = ""
        while True:
            elapsed = time.monotonic() - t0
            limit = probe_s if not saw_backend else total_s
            if elapsed > limit:
                child.kill()
                stage = "probe" if not saw_backend else "run"
                pytest.skip(
                    f"TPU smoke {stage} stage exceeded {limit:.0f}s — "
                    f"link stalled or compile too slow (output so far: "
                    f"{lines[-3:]})"
                )
            if not sel.select(timeout=1.0):
                if child.poll() is not None:
                    break
                continue
            chunk = child.stdout.read(4096)
            if not chunk:
                if child.poll() is not None:
                    break
                continue
            buf += chunk
            while "\n" in buf:
                line, buf = buf.split("\n", 1)
                lines.append(line)
                if line.startswith("BACKEND"):
                    saw_backend = True
                if line.startswith("NOTPU"):
                    child.wait(timeout=30)
                    pytest.skip("no TPU backend reachable")
    finally:
        if child.poll() is None:
            child.kill()
    rc = child.wait(timeout=30)
    out = "\n".join(lines)
    assert rc == 0, f"on-chip smoke failed (rc={rc}):\n{out}"
    assert any(ln.startswith("OK") for ln in lines), out
