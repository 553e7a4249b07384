"""Measure the kernel-sharded loop COMPILED on the real chip (S=1).

One chip cannot demonstrate multi-chip speed, but the per-epoch cost of
the composed path — replicated frozen-table selection + the compiled
replay/emission Pallas dispatch + the cell-log exchange/validate — on
real hardware anchors the multi-chip projection (PERFORMANCE.md
§crossover): a pod run pays this per-epoch cost at shard size N/S plus
one ICI/DCN collective.

The merge record must equal the native engine's prefix (exactness).

Usage: python scripts/chip_sharded.py <corpus> <vocab> <num_merges> [k]
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
from yabpe_tpu.dist.hbm_sharded import run_hbm_sharded_merge_loop
from yabpe_tpu.pretok.ingest import count_pretokens_raw, counter_from_raw


def main() -> None:
    corpus = sys.argv[1]
    vocab_size = int(sys.argv[2])
    num_merges = int(sys.argv[3])
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    specials = ["<|endoftext|>"]

    blob, lens, counts = count_pretokens_raw(
        [corpus], specials, max_workers=8
    )
    base = Vocab.base(specials)
    wt = WordTable.from_counter(counter_from_raw(blob, lens, counts))
    print(f"uniques={wt.num_words} width={wt.width}", flush=True)

    # native oracle prefix -> id triples
    merges = native.train_host_raw(blob, lens, counts, num_merges, 2)
    tok2id = {t: i for i, t in enumerate(base.tokens())}
    want = np.full((num_merges, 3), -1, dtype=np.int32)
    for i, (left, right) in enumerate(merges):
        c = left + right
        if c not in tok2id:
            tok2id[c] = len(tok2id)
        want[i] = (tok2id[left], tok2id[right], tok2id[c])

    stats: dict = {}
    t0 = time.perf_counter()
    got = run_hbm_sharded_merge_loop(
        wt, base,
        vocab_cap=vocab_size, num_merges=num_merges, min_frequency=2,
        data_shards=1, spec_batch=k, interpret=False, stats_out=stats,
    )
    dt = time.perf_counter() - t0
    np.testing.assert_array_equal(got, want)
    epochs = stats["epochs"]
    print(
        f"kernel-sharded (COMPILED, S=1): {num_merges} merges in {dt:.1f}s "
        f"(incl. compile) over {epochs} epochs = {dt / max(epochs, 1) * 1e3:.1f} "
        f"ms/epoch, {stats['merges_done'] / max(epochs, 1):.2f} commits/epoch, "
        f"{stats['fallbacks']} fallbacks; byte-identical to native",
        flush=True,
    )
    # warm second run (compiles cached)
    stats2: dict = {}
    t0 = time.perf_counter()
    got2 = run_hbm_sharded_merge_loop(
        wt, base,
        vocab_cap=vocab_size, num_merges=num_merges, min_frequency=2,
        data_shards=1, spec_batch=k, interpret=False, stats_out=stats2,
    )
    dt2 = time.perf_counter() - t0
    np.testing.assert_array_equal(got2, want)
    print(
        f"kernel-sharded warm: {dt2:.1f}s, "
        f"{dt2 / max(stats2['epochs'], 1) * 1e3:.1f} ms/epoch "
        f"({num_merges / dt2:.0f} merges/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
