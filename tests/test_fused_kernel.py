"""Fused Pallas merge-loop kernel: exactness vs the host oracle.

Runs in Pallas interpret mode on the CPU backend (the TPU compile of the
same kernel is exercised by bench.py / the real-chip suite).
"""

from __future__ import annotations

import random
from collections import Counter

import numpy as np
import pytest

import jax.numpy as jnp

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.kernels.fused_loop import fused_merge_chunk
from yabpe_tpu.train.incremental import init_counts
from yabpe_tpu.train.reference_loop import train_merges_oracle
from yabpe_tpu.train.state import init_state, merges_to_bytes


def run_fused(counter, specials, vocab_size, min_frequency=1, chunk=16,
              batch_rows=8):
    base = Vocab.base(specials)
    wt = WordTable.from_counter(counter)
    cap = max(vocab_size, len(base))
    num = max(0, vocab_size - len(base))
    st = init_state(wt, base, cap, num)
    counts = init_counts(st.words, st.freqs, vocab_cap=cap).reshape(cap, cap)
    words = st.words
    token_bytes = st.token_bytes
    token_len = st.token_len.reshape(1, -1)
    lex = st.lex_rank.reshape(1, -1)
    merges = jnp.full((max(num, 1), 4), -1, jnp.int32)
    freqs = st.freqs.reshape(1, -1)
    scalars = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(st.next_id)
    start = 0
    while start < num:
        scalars = scalars.at[0, 3].set(start)
        (words, counts, token_bytes, token_len, lex, merges,
         scalars) = fused_merge_chunk(
            words, counts, token_bytes, token_len, lex, merges, scalars,
            freqs,
            vocab_cap=cap, num_merges=num, chunk_size=chunk,
            min_frequency=min_frequency, batch_rows=batch_rows,
            interpret=True,
        )
        start += chunk
        if int(scalars[0, 1]) != 0:
            break
    rec = np.asarray(merges)[:, :3]
    return merges_to_bytes(rec, base)


def test_fused_basic_with_dedup_and_runs():
    counter = Counter({b"abab": 10, b"aaa": 7, b"ab": 5, b"cd": 3})
    vocab, merges = run_fused(counter, [], 262)
    ov, om = train_merges_oracle(counter, [], 262, 1)
    assert merges == om
    assert vocab.as_bytes_to_id() == ov.as_bytes_to_id()


def test_fused_min_frequency_stop():
    counter = Counter({b"ab": 5, b"cd": 1})
    _, merges = run_fused(counter, [], 300, min_frequency=2)
    assert merges == [(b"a", b"b")]


def test_fused_batch_overflow_multibatch():
    """More affected rows than batch_rows forces the multi-batch path."""
    counter = Counter({f"x{i:02d}ab".encode(): 1 + (i % 3) for i in range(40)})
    counter[b"ab"] = 50
    vocab, merges = run_fused(counter, [], 262, batch_rows=4)
    ov, om = train_merges_oracle(counter, [], 262, 1)
    assert merges == om
    assert vocab.as_bytes_to_id() == ov.as_bytes_to_id()


@pytest.mark.parametrize("seed", range(4))
def test_fused_matches_oracle_random(seed):
    rng = random.Random(seed)
    alphabet = "abcdeé 東!"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(rng.randint(5, 50))
    ]
    counter = Counter()
    for w in words:
        counter[w.encode("utf-8")] += rng.randint(1, 9)
    vocab_size = 256 + rng.randint(1, 40)
    fv, fm = run_fused(counter, [], vocab_size)
    ov, om = train_merges_oracle(counter, [], vocab_size, 1)
    assert fm == om
    assert fv.as_bytes_to_id() == ov.as_bytes_to_id()
