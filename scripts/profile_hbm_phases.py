"""Decompose the HBM kernel's per-step cost by phase on a real workload.

The remote PJRT link exposes no op-level device profile, so this measures
by ABLATION: replay-mode runs (selection replaced by recorded merges)
with compile-time phase skips (see hbm_merge_chunk's ``ablate``), plus
the normal selecting run. Differences between consecutive variants give
the per-phase cost. Merges come from the native engine (byte-identical
to the kernel's, so replay applies the true workload).

Usage: python scripts/profile_hbm_phases.py CORPUS VOCAB [CHUNK]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np

from yabpe_tpu import native
from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.pretok.ingest import count_pretokens_raw, counter_from_raw
from yabpe_tpu.train.hbm_driver import run_hbm_merge_loop


def main() -> None:
    corpus = Path(sys.argv[1])
    vocab_size = int(sys.argv[2])
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    specials = ["<|endoftext|>"]

    blob, lens, counts = count_pretokens_raw(
        [corpus], specials, max_workers=2
    )
    base = Vocab.base(specials)
    b0 = len(list(base.tokens()))
    num_merges = vocab_size - b0
    wt = WordTable.from_counter(counter_from_raw(blob, lens, counts))
    print(f"uniques={wt.num_words} width={wt.width}", flush=True)

    t0 = time.perf_counter()
    merges = native.train_host_raw(blob, lens, counts, num_merges, 2)
    print(
        f"native merges: {len(merges)} in {time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    tok2id = {t: i for i, t in enumerate(base.tokens())}
    mid = np.full((num_merges, 3), -1, dtype=np.int32)
    for i, (l, r) in enumerate(merges):
        c = l + r
        if c not in tok2id:
            tok2id[c] = len(tok2id)
        mid[i] = (tok2id[l], tok2id[r], tok2id[c])

    def run(label: str, *, replay: bool, ablate: int):
        chunk_times: list[float] = []
        last = [time.perf_counter()]

        def on_chunk(_m, _s):
            now = time.perf_counter()
            chunk_times.append(now - last[0])
            last[0] = now

        t0 = time.perf_counter()
        last[0] = t0
        ids = run_hbm_merge_loop(
            wt,
            base,
            vocab_cap=vocab_size,
            num_merges=num_merges,
            min_frequency=2,
            chunk_size=chunk,
            on_chunk=on_chunk,
            resume=(mid, len(merges)) if replay else None,
            ablate=ablate,
        )
        total = time.perf_counter() - t0
        # chunk 0 includes compile; report warm chunks and a warm total
        warm = sum(chunk_times[1:])
        print(
            f"{label:18s} total={total:7.1f}s chunk0={chunk_times[0]:6.1f}s "
            f"warm_rest={warm:6.1f}s per_chunk="
            + ",".join(f"{t:.2f}" for t in chunk_times[:8])
            + ("..." if len(chunk_times) > 8 else ""),
            flush=True,
        )
        if not replay and ablate == 0:
            got = ids[ids[:, 0] >= 0]
            assert len(got) == len(merges), "merge count mismatch"
        return chunk_times

    # Order cheapest-first so early failures cost the least.
    run("floor(replay,a1)", replay=True, ablate=1)
    run("scan(replay,a4)", replay=True, ablate=4)
    run("emit(replay,a2)", replay=True, ablate=2)
    run("replay(a0)", replay=True, ablate=0)
    run("full(select)", replay=False, ablate=0)


if __name__ == "__main__":
    main()
