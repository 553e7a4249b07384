"""Large-vocab merge loop (lazy row-max selection): exactness tests."""

from __future__ import annotations

import random
from collections import Counter

import numpy as np
import jax.numpy as jnp

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.train.bigvocab import lazy_select, run_bigvocab_merge_loop
from yabpe_tpu.train.reference_loop import train_merges_oracle
from yabpe_tpu.train.state import merges_to_bytes
from yabpe_tpu.kernels.select import select_best_pair


def test_lazy_select_with_stale_bounds():
    V = 8
    toks = [bytes([65 + i]) for i in range(V)]
    from yabpe_tpu.core import lexkey

    lex = jnp.asarray(lexkey.initial_lex_ranks(toks, V))
    counts = np.zeros((V, V), dtype=np.int32)
    counts[2, 3] = 7
    counts[5, 1] = 7
    counts[6, 6] = 4
    flat = jnp.asarray(counts.reshape(-1))
    # Stale bounds: rows 4 and 7 claim a higher max than they have.
    row_max = jnp.asarray(
        np.array([0, 0, 7, 0, 9, 7, 4, 11], dtype=np.int32)
    )
    a, b, m, rm = lazy_select(flat, row_max, lex, V)
    ref_a, ref_b, ref_m = select_best_pair(flat, lex, V)
    assert (int(a), int(b), int(m)) == (int(ref_a), int(ref_b), int(ref_m))
    assert int(jnp.max(rm)) == 7


def test_bigvocab_matches_oracle_random():
    for seed in range(3):
        rng = random.Random(200 + seed)
        words = [
            "".join(rng.choice("abcdef 東") for _ in range(rng.randint(1, 10)))
            for _ in range(rng.randint(5, 50))
        ]
        counter = Counter()
        for w in words:
            counter[w.encode()] += rng.randint(1, 9)
        vs = 256 + rng.randint(1, 40)
        base = Vocab.base([])
        rec = run_bigvocab_merge_loop(
            WordTable.from_counter(counter),
            base,
            vocab_cap=vs,
            num_merges=vs - 256,
            min_frequency=1,
            chunk_size=16,
        )
        _, fm = merges_to_bytes(rec, base)
        _, om = train_merges_oracle(counter, [], vs, 1)
        assert fm == om, seed


def test_trainer_routes_large_vocab(tmp_path):
    """vocab_size > 2048 goes through the bigvocab path and still matches."""
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    p = tmp_path / "c.txt"
    p.write_text("ba na na splits bananas and bandanas " * 50)
    kw = dict(min_frequency=1, max_workers=1, special_tokens=[])
    big = BBPETrainer(BBPETrainerConfig(vocab_size=2100, **kw)).train([p])
    # Compare against the small-vocab (incremental) path: pairs exhaust long
    # before 2100 merges, so both stop at the same place.
    small = BBPETrainer(BBPETrainerConfig(vocab_size=2048, **kw)).train([p])
    assert big.merges == small.merges
