"""Forced-device flagship run with a byte-identity assert vs native.

Trains ``corpus`` at ``vocab`` twice: once on the native C++ host engine
(the exactness oracle at this scale) and ``reps`` times forced through
the HBM Pallas kernel, asserting identical merges every rep. The kernel
iteration workhorse: run after every kernel change, on the real chip.

Usage: python scripts/chip_flagship.py <corpus> <vocab> [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

from yabpe_tpu import BBPETrainer, BBPETrainerConfig  # noqa: E402


def main() -> None:
    corpus = sys.argv[1]
    vocab = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    kw = dict(
        vocab_size=vocab,
        min_frequency=2,
        max_workers=8,
        chunk_size_bytes=64 << 20,
        special_tokens=["<|endoftext|>"],
        align_chunks_to_newline=True,
    )
    ref = BBPETrainer(BBPETrainerConfig(**kw))
    t0 = time.perf_counter()
    want = ref.train([corpus]).merges
    tn = time.perf_counter() - t0
    print(
        f"native: {tn:.2f}s total (merge "
        f"{ref.last_stats['merge_seconds']:.2f}s), {len(want)} merges",
        flush=True,
    )
    for r in range(reps):
        tr = BBPETrainer(
            BBPETrainerConfig(**kw, use_native_loop=False, use_hbm_kernel=True)
        )
        t0 = time.perf_counter()
        model = tr.train([corpus])
        dt = time.perf_counter() - t0
        assert model.merges == want, "DIVERGED from native"
        print(
            f"device rep{r}: {dt:.2f}s total, merge "
            f"{tr.last_stats['merge_seconds']:.2f}s, ingest "
            f"{tr.last_stats['ingest_seconds']:.2f}s, byte-identical",
            flush=True,
        )


if __name__ == "__main__":
    main()
