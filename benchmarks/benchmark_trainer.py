"""Trainer benchmark workloads (mirrors the reference's harness shapes:
corpus.en @500/@1000, 5MB TinyStories @1000; plus the synthetic 100MB
large-scale workload). Prints human-readable timings; see bench.py at the
repo root for the driver-facing one-line JSON harness."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))

from yabpe_tpu import BBPETrainer, BBPETrainerConfig  # noqa: E402

REF_FIX = Path("/root/reference/tests/fixtures_gpt2")


def run(name, files, vocab_size, **kw):
    kw.setdefault("min_frequency", 1)
    cfg = BBPETrainerConfig(
        vocab_size=vocab_size, max_workers=8,
        special_tokens=["<|endoftext|>"], **kw,
    )
    tr = BBPETrainer(cfg)
    tr.train(files)  # warm-up (jit)
    t0 = time.perf_counter()
    model = tr.train(files)
    dt = time.perf_counter() - t0
    size = sum(Path(f).stat().st_size for f in files)
    print(
        f"{name}: {dt:.3f}s  {size / dt / 1e6:.2f} MB/s  "
        f"({len(model.merges)} merges; ingest "
        f"{tr.last_stats['ingest_seconds']:.3f}s, merge "
        f"{tr.last_stats['merge_seconds']:.3f}s)"
    )


def main():
    run("corpus.en @500", [REF_FIX / "corpus.en"], 500,
        chunk_size_bytes=1 << 30, max_pair_table_bytes=6 << 30)
    run("corpus.en @1000", [REF_FIX / "corpus.en"], 1000,
        chunk_size_bytes=1 << 30)
    five_m = REPO / "tests/fixtures_gpt2/tinystories_sample_5M.txt"
    if five_m.exists():
        run("tinystories 5MB @1000", [five_m], 1000,
            chunk_size_bytes=1 << 20, align_chunks_to_newline=True)
    synth = Path("/tmp/synth_100M.txt")
    if synth.exists():
        run("synthetic 100MB @8192", [synth], 8192,
            chunk_size_bytes=8 << 20, align_chunks_to_newline=True,
            min_frequency=2)
    synth_1g = Path("/tmp/synth_1G.txt")
    if synth_1g.exists():
        # North-star workload (BASELINE.json): 32k-merge training on ~1 GB.
        run("synthetic 1GB @32000", [synth_1g], 32000,
            chunk_size_bytes=32 << 20, align_chunks_to_newline=True,
            min_frequency=2)


if __name__ == "__main__":
    main()
