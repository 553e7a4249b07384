"""Unit tests for the replay/emission kernel (kernels/replay_emit.py).

Oracle: a direct numpy replay of the reference's merge application
(/root/reference/src/yet_another_bpe/trainer.py:253-294 — leftmost
non-overlapping occurrence replacement) plus full-word old/new pair
deltas. The kernel emits changed-window cells (excluded cells cancel as
a bijection), so per-step NET dense deltas must match exactly even
though the cell multisets differ.
"""

from __future__ import annotations

import numpy as np
import pytest

from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.train.hbm_driver import pack_words


def _mk_table(words_list, freqs, width):
    n = len(words_list)
    words = np.full((n, width), -1, dtype=np.int32)
    for i, w in enumerate(words_list):
        words[i, : len(w)] = w
    return WordTable(
        words=words,
        freqs=np.asarray(freqs, dtype=np.int64),
        num_words=n,
        max_len=max(len(w) for w in words_list),
    )


def _unpack(packed, n, w):
    nr = packed.shape[0]
    cols = (
        np.asarray(packed)
        .reshape(nr, w + 2, 128)
        .transpose(0, 2, 1)
        .reshape(nr * 128, w + 2)
    )
    return cols[:n, :w].astype(np.int32)


def _apply_word(word, a, b, c):
    out = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
            out.append(c)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return out


def _oracle_replay(words_list, freqs, chain, vcap):
    """Per-step dense [vcap, vcap] deltas + final words."""
    words_list = [list(w) for w in words_list]
    deltas = []
    for a, b, c in chain:
        delta = np.zeros((vcap, vcap), dtype=np.int64)
        if a < 0:
            deltas.append(delta)
            continue
        for i, w in enumerate(words_list):
            hit = any(
                w[j] == a and w[j + 1] == b for j in range(len(w) - 1)
            )
            if not hit:
                continue
            new = _apply_word(w, a, b, c)
            for j in range(len(w) - 1):
                delta[w[j], w[j + 1]] -= freqs[i]
            for j in range(len(new) - 1):
                delta[new[j], new[j + 1]] += freqs[i]
            words_list[i] = new
        deltas.append(delta)
    return words_list, deltas


def _cells_to_dense(log_l, log_r, log_w, step, cps, vcap):
    lo, hi = step * cps, (step + 1) * cps
    l = np.asarray(log_l[lo:hi]).ravel()
    r = np.asarray(log_r[lo:hi]).ravel()
    w = np.asarray(log_w[lo:hi]).ravel()
    dense = np.zeros((vcap, vcap), dtype=np.int64)
    live = l >= 0
    np.add.at(dense, (l[live], r[live]), w[live])
    return dense


def _run_case(words_list, freqs, chain, width, cps=64, wide=False):
    import jax.numpy as jnp

    from yabpe_tpu.kernels.replay_emit import replay_emit_chunk

    table = _mk_table(words_list, freqs, width)
    packed = pack_words(table)
    k = len(chain)
    chain_np = np.full((k, 128), -1, dtype=np.int32)
    for j, (a, b, c) in enumerate(chain):
        chain_np[j, :3] = (a, b, c)
    out_words, ll, lr, lw, ok = replay_emit_chunk(
        jnp.asarray(packed),
        jnp.asarray(chain_np),
        word_width=max(width, 2),
        cps=cps,
        cps0=cps,  # uniform slices keep the oracle indexing simple
        wide=wide,
        interpret=True,
    )
    return table, np.asarray(out_words), ll, lr, lw, np.asarray(ok)


@pytest.mark.parametrize("seed", [0, 1])
def test_replay_emit_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    width = 12
    vcap = 64
    n = 300
    words_list = [
        rng.integers(0, 40, size=rng.integers(1, width + 1)).tolist()
        for _ in range(n)
    ]
    freqs = rng.integers(1, 9, size=n).tolist()

    # chain: merges over pairs that exist, pairs that don't, an inactive
    # row, and a chained merge consuming a previously created symbol
    chain = [
        (words_list[0][0], words_list[0][1], 40)
        if len(words_list[0]) > 1
        else (0, 1, 40),
        (3, 5, 41),
        (99, 98, 42),  # absent pair: zero delta, no-op apply
        (-1, -1, -1),  # inactive row
        (41, 2, 43),   # uses the symbol created at step 1
        (7, 7, 44),    # overlapping-run pair (leftmost non-overlap)
    ]

    table, out_words, ll, lr, lw, ok = _run_case(
        words_list, freqs, chain, width
    )
    final_oracle, deltas = _oracle_replay(
        [list(w) for w in words_list], freqs, chain, vcap
    )

    assert ok.tolist() == [1] * len(chain)
    got = _unpack(out_words, n, max(width, 2))
    for i, w in enumerate(final_oracle):
        assert got[i, : len(w)].tolist() == w, f"word {i}"
        assert (got[i, len(w) :] == -1).all()
    for j in range(len(chain)):
        dense = _cells_to_dense(ll, lr, lw, j, 64, vcap)
        np.testing.assert_array_equal(
            dense, deltas[j], err_msg=f"step {j} delta"
        )


def test_replay_emit_overflow_flags():
    """A step whose cells exceed cps*128 flags ok=0; words still apply."""
    width = 8
    n = 600  # every word affected at step 0 -> cells far past 8*128
    words_list = [[1, 2, 3] for _ in range(n)]
    freqs = [1] * n
    chain = [(1, 2, 50), (50, 3, 51)]
    table, out_words, ll, lr, lw, ok = _run_case(
        words_list, freqs, chain, width, cps=8
    )
    assert ok[0] == 0  # overflowed
    # the apply itself is unaffected by log overflow
    got = _unpack(out_words, n, width)
    assert got[0, :2].tolist() == [50, 3] or got[0, :1].tolist() == [51]


def test_replay_emit_wide_ids():
    """u16 bit-pattern symbol ids past i16 range (GPT-2-scale vocab)."""
    width = 6
    base = 40000
    words_list = [[base, base + 1, base + 2], [base + 1, base + 2]]
    freqs = [3, 5]
    chain = [(base, base + 1, base + 3), (base + 1, base + 2, base + 4)]
    table, out_words, ll, lr, lw, ok = _run_case(
        words_list, freqs, chain, width, wide=True
    )
    assert ok.tolist() == [1, 1]
    nr = out_words.shape[0]
    cols = (
        out_words.reshape(nr, width + 2, 128)
        .transpose(0, 2, 1)
        .reshape(nr * 128, width + 2)
    )
    syms = cols[:2, :width].astype(np.int32) & 0xFFFF
    assert syms[0, :2].tolist() == [base + 3, base + 2]
    assert syms[1, :1].tolist() == [base + 4]
    # step-0 cells: -(base,base+1), -(base+1,base+2) [word 0 old],
    # +(base+3,base+2) [word 0 new]
    l0 = np.asarray(ll[:64]).ravel()
    w0 = np.asarray(lw[:64]).ravel()
    live = l0 >= 0
    assert w0[live].sum() == -3  # net: word0 loses one adjacent pair


@pytest.mark.chip
@pytest.mark.parametrize(
    "wide,cps0",
    [
        (False, 128),
        # wide u16 ids + a production-representative cps0 (ADVICE r4:
        # large cps0 shape families were interpret-only before — the
        # log zero-init must trace as a fori_loop, not 1000s of stores)
        (True, 8192),
    ],
)
def test_replay_emit_on_chip_matches_interpret(wide, cps0):
    """Mosaic-compiled kernel == interpreter, byte-for-byte (real TPU).

    Interpret mode can hide lowering restrictions; this pins the
    compiled kernel's words and cell logs to the oracle-pinned
    interpreter outputs on the real chip — in both id modes and at a
    production-scale cps0.
    """
    import jax.numpy as jnp

    from yabpe_tpu.utils.jaxsetup import effective_backend

    if effective_backend() != "tpu":
        pytest.skip("needs a TPU (run with YABPE_TEST_TPU=1)")
    rng = np.random.default_rng(3)
    width = 12
    n = 500
    off = 40000 if wide else 0  # u16 bit patterns past i16 range
    words_list = [
        (off + rng.integers(0, 40, size=rng.integers(1, width + 1))).tolist()
        for _ in range(n)
    ]
    freqs = rng.integers(1, 9, size=n).tolist()
    table = _mk_table(words_list, freqs, width)
    packed = pack_words(table)
    chain_np = np.full((4, 128), -1, np.int32)
    chain_np[0, :3] = (words_list[0][0], words_list[0][1], off + 40)
    chain_np[1, :3] = (off + 3, off + 5, off + 41)
    chain_np[2, :3] = (off + 40, off + 2, off + 42)

    from yabpe_tpu.kernels.replay_emit import replay_emit_chunk

    outs = {}
    for interp in (False, True):
        outs[interp] = replay_emit_chunk(
            jnp.asarray(packed), jnp.asarray(chain_np),
            word_width=width, cps=64, cps0=cps0, wide=wide,
            interpret=interp,
        )
    for a, b, name in zip(
        outs[False], outs[True], ["words", "ll", "lr", "lw", "ok"]
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )
