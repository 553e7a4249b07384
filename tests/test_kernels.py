"""Tier-1 unit tests: device kernels (run on the JAX CPU backend)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from yabpe_tpu.core import lexkey
from yabpe_tpu.core.wordtable import PAD, WordTable
from yabpe_tpu.kernels.merge_apply import (
    _compact_rows_onehot,
    _compact_rows_sort,
    apply_pair_merge,
    leftmost_nonoverlapping,
)
from yabpe_tpu.kernels.pair_count import pair_counts_dense, pair_counts_matmul
from yabpe_tpu.kernels.select import select_best_pair


# ---------------------------------------------------------------- word table


def test_wordtable_roundtrip():
    wt = WordTable.from_counter({b"abc": 3, b"a": 1, b"zz": 7})
    assert wt.num_words == 3
    assert wt.total_bytes == 3 * 3 + 1 + 2 * 7
    # canonical sort order by bytes
    row0 = wt.words[0]
    assert bytes(row0[row0 >= 0].astype(np.uint8)) == b"a"


def test_wordtable_width_guard():
    with pytest.raises(ValueError):
        WordTable.from_counter({b"abcdef": 1}, width=3)


# ------------------------------------------------------------------- lex keys


def test_rows_vs_query_prefix_rule():
    toks = [b"ab", b"abc", b"abd", b"b", b"a"]
    mat, _ = lexkey.initial_token_matrix(toks, 8, 8)
    query = np.full(8, -1, dtype=np.int32)
    query[:3] = list(b"abc")
    less, equal = lexkey.rows_vs_query(jnp.asarray(mat), jnp.asarray(query))
    less, equal = np.asarray(less), np.asarray(equal)
    # python bytes order oracle
    expected_less = [t < b"abc" for t in toks]
    expected_eq = [t == b"abc" for t in toks]
    assert less[:5].tolist() == expected_less
    assert equal[:5].tolist() == expected_eq


def test_initial_lex_ranks_match_sorted():
    toks = [bytes([b]) for b in range(256)] + [b"<|endoftext|>"]
    ranks = lexkey.initial_lex_ranks(toks, 300)
    order = sorted(range(len(toks)), key=lambda i: toks[i])
    for rank, idx in enumerate(order):
        assert ranks[idx] == rank


def test_concat_token_bytes():
    toks = [b"ab", b"cde"]
    mat, lens = lexkey.initial_token_matrix(toks, 4, 8)
    merged, mlen = lexkey.concat_token_bytes(
        jnp.asarray(mat), jnp.asarray(lens), jnp.int32(0), jnp.int32(1)
    )
    merged = np.asarray(merged)
    assert int(mlen) == 5
    assert bytes(merged[:5].astype(np.uint8)) == b"abcde"
    assert (merged[5:] == lexkey.BYTE_PAD).all()


def test_insert_lex_rank_shifts():
    toks = [b"a", b"c", b"e"]
    mat, _ = lexkey.initial_token_matrix(toks, 4, 4)
    ranks = jnp.asarray(lexkey.initial_lex_ranks(toks, 4))
    active = jnp.asarray([True, True, True, False])
    query = np.full(4, -1, dtype=np.int32)
    query[0] = ord("d")
    less, _ = lexkey.rows_vs_query(jnp.asarray(mat), jnp.asarray(query))
    bumped, ins = lexkey.insert_lex_rank(ranks, active, less)
    assert int(ins) == 2  # "d" sorts after "a","c"
    assert np.asarray(bumped)[:3].tolist() == [0, 1, 3]


# ------------------------------------------------------------------ pair count


def _np_pair_counts(words, freqs, V):
    out = np.zeros((V, V), dtype=np.int64)
    for row, f in zip(words, freqs):
        row = row[row >= 0]
        for a, b in zip(row, row[1:]):
            out[a, b] += f
    return out


def test_pair_counts_dense_matches_naive():
    rng = np.random.default_rng(0)
    V = 40
    words = rng.integers(0, V, size=(50, 12)).astype(np.int32)
    lens = rng.integers(1, 13, size=50)
    for i, ln in enumerate(lens):
        words[i, ln:] = PAD
    freqs = rng.integers(0, 100, size=50).astype(np.int32)
    got = np.asarray(pair_counts_dense(jnp.asarray(words), jnp.asarray(freqs), V))
    assert np.array_equal(got.reshape(V, V), _np_pair_counts(words, freqs, V))


def test_pair_counts_matmul_matches_dense():
    rng = np.random.default_rng(1)
    V = 64
    words = rng.integers(0, V, size=(80, 10)).astype(np.int32)
    words[words % 7 == 0] = PAD
    freqs = rng.integers(0, 50, size=80).astype(np.int32)
    dense = np.asarray(pair_counts_dense(jnp.asarray(words), jnp.asarray(freqs), V))
    matmul = np.asarray(
        pair_counts_matmul(jnp.asarray(words), jnp.asarray(freqs), V)
    )
    assert np.array_equal(dense, matmul)


def test_pair_counts_overlapping_run():
    # "aaa" contributes (a,a) twice per occurrence.
    words = np.full((1, 4), PAD, dtype=np.int32)
    words[0, :3] = 5
    counts = np.asarray(
        pair_counts_dense(jnp.asarray(words), jnp.asarray([3], dtype=np.int32), 8)
    ).reshape(8, 8)
    assert counts[5, 5] == 6


# -------------------------------------------------------------------- select


def test_select_best_pair_tiebreak():
    V = 6
    toks = [b"a", b"b", b"c", b"d", b"e", b"f"]
    lex = jnp.asarray(lexkey.initial_lex_ranks(toks, V))
    counts = np.zeros((V, V), dtype=np.int32)
    counts[1, 2] = 5  # (b, c)
    counts[3, 0] = 5  # (d, a)  <- lexicographically greatest left wins
    counts[3, 4] = 4
    left, right, cnt = select_best_pair(jnp.asarray(counts.reshape(-1)), lex, V)
    assert (int(left), int(right), int(cnt)) == (3, 0, 5)
    # right tie-break within the winning row
    counts[3, 0] = 0
    counts[3, 1] = 5
    counts[3, 5] = 5
    left, right, cnt = select_best_pair(jnp.asarray(counts.reshape(-1)), lex, V)
    assert (int(left), int(right)) == (3, 5)


# --------------------------------------------------------------- merge apply


def test_leftmost_nonoverlapping_runs():
    match = jnp.asarray(np.array([[1, 1, 1, 0], [1, 1, 1, 1], [0, 1, 1, 0]], bool))
    applied = np.asarray(leftmost_nonoverlapping(match))
    assert applied.tolist() == [
        [True, False, True, False],
        [True, False, True, False],
        [False, True, False, False],
    ]


def test_compaction_variants_agree():
    rng = np.random.default_rng(2)
    vals = rng.integers(-1, 100, size=(64, 24)).astype(np.int32)
    keep = rng.random((64, 24)) < 0.6
    a = np.asarray(_compact_rows_onehot(jnp.asarray(vals), jnp.asarray(keep)))
    b = np.asarray(_compact_rows_sort(jnp.asarray(vals), jnp.asarray(keep)))
    assert np.array_equal(a, b)


def _merge_row_oracle(row, a, b, new):
    out, i = [], 0
    while i < len(row):
        if i + 1 < len(row) and row[i] == a and row[i + 1] == b:
            out.append(new)
            i += 2
        else:
            out.append(row[i])
            i += 1
    return out


def test_apply_pair_merge_matches_oracle():
    rng = np.random.default_rng(3)
    V = 5  # small alphabet -> many matches, many runs
    words = rng.integers(0, V, size=(200, 9)).astype(np.int32)
    lens = rng.integers(1, 10, size=200)
    for i, ln in enumerate(lens):
        words[i, ln:] = PAD
    for a, b in [(1, 2), (3, 3), (0, 0)]:
        got = np.asarray(apply_pair_merge(jnp.asarray(words), a, b, 7))
        for i in range(200):
            row = [int(x) for x in words[i] if x != PAD]
            want = _merge_row_oracle(row, a, b, 7)
            have = [int(x) for x in got[i] if x != PAD]
            assert have == want, (i, row, a, b)
