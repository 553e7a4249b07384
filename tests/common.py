"""Shared test helpers: fixture paths, GPT-2 remap access."""

from __future__ import annotations

import os
from pathlib import Path

from yabpe_tpu.io import gpt2 as gpt2io

REPO = Path(__file__).resolve().parent.parent
# Conformance corpora live in the read-only reference mount by default; a
# standalone checkout can point this at its own copy.
REF_FIXTURES = Path(
    os.environ.get(
        "YABPE_REF_FIXTURES", "/root/reference/tests/fixtures_gpt2"
    )
)
LOCAL_FIXTURES = REPO / "tests" / "fixtures_gpt2"
DATA = REPO / "tests" / "data"


def gpt2_bytes_to_unicode() -> dict[int, str]:
    """Byte -> printable-unicode map (GPT-2 encoder convention)."""
    return gpt2io.byte_to_unicode()


def load_reference_merges(path: Path) -> list[tuple[bytes, bytes]]:
    """Load a GPT-2-dialect merges file as byte pairs."""
    return gpt2io.load_gpt2_merges(path)
