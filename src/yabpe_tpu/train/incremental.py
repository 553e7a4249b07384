"""Incremental merge loop: persistent count table + affected-row deltas.

TPU-native analogue of the reference's incremental bookkeeping
(/root/reference/src/yet_another_bpe/trainer.py:253-294): the dense pair
count table lives on device as training state, and each merge step updates
only the rows containing the merged pair — gathered into a fixed-capacity
buffer via a cumsum-slot scatter — subtracting their old adjacent-pair
counts and adding the new ones. When more rows are affected than the buffer
holds (the first few merges), a ``lax.cond`` falls back to the full
recount + full-table apply. Per-step device work drops from
O(total symbols) to O(affected x width) for the overwhelming majority of
steps, and in the data-parallel path the psum shrinks from the whole
[V, V] table to the same small deltas.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from yabpe_tpu.kernels.merge_apply import apply_pair_merge
from yabpe_tpu.kernels.pair_count import adjacent_pairs, pair_counts_dense
from yabpe_tpu.kernels.select import select_best_pair
from yabpe_tpu.train.state import TrainState, vocab_update


class IncState(NamedTuple):
    core: TrainState
    counts: jax.Array  # [V*V] int32, persistent


@partial(jax.jit, static_argnames=("vocab_cap",))
def init_counts(words: jax.Array, freqs: jax.Array, *, vocab_cap: int) -> jax.Array:
    return pair_counts_dense(words, freqs, vocab_cap)


def _affected_slots(affected: jax.Array, cap: int) -> tuple[jax.Array, jax.Array]:
    """Pack indices of affected rows into a [cap] buffer.

    Returns (idx_buf, val_buf): row indices (== N for empty slots, which
    out-of-bounds scatters then drop) and slot validity.
    """
    n = affected.shape[0]
    pos = jnp.cumsum(affected.astype(jnp.int32)) - 1
    slot = jnp.where(affected & (pos < cap), pos, cap)
    row_iota = jnp.arange(n, dtype=jnp.int32)
    idx_buf = jnp.full((cap,), n, dtype=jnp.int32).at[slot].set(
        row_iota, mode="drop"
    )
    val_buf = jnp.zeros((cap,), dtype=bool).at[slot].set(True, mode="drop")
    return idx_buf, val_buf


def _pair_delta(
    rows: jax.Array, f: jax.Array, vocab_cap: int, sign: int
) -> tuple[jax.Array, jax.Array]:
    """(keys, weights) of ``sign *`` adjacent-pair counts of ``rows``."""
    left, right, valid = adjacent_pairs(rows)
    oob = vocab_cap * vocab_cap
    keys = jnp.where(valid, left * vocab_cap + right, oob)
    weights = jnp.where(valid, sign * f[:, None], 0).astype(jnp.int32)
    return keys.reshape(-1), weights.reshape(-1)


def count_delta_and_apply(
    words: jax.Array,
    freqs: jax.Array,
    left: jax.Array,
    right: jax.Array,
    new_sym: jax.Array,
    *,
    vocab_cap: int,
    affected_cap: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compute (new_words, count_delta, overflowed) for one merge.

    The delta is exact when ``overflowed`` is False; callers must fall back
    to a full recount otherwise (handled by merge_step_incremental).
    """
    n = words.shape[0]
    l = words[:, :-1]
    r = words[:, 1:]
    affected = jnp.any((l == left) & (r == right) & (l >= 0), axis=1)
    n_aff = jnp.sum(affected.astype(jnp.int32))
    overflowed = n_aff > affected_cap

    idx_buf, val_buf = _affected_slots(affected, affected_cap)
    safe_idx = jnp.minimum(idx_buf, n - 1)
    rows = words[safe_idx]
    f = jnp.where(val_buf, freqs[safe_idx], 0)

    old_keys, old_w = _pair_delta(rows, f, vocab_cap, -1)
    new_rows = apply_pair_merge(rows, left, right, new_sym)
    new_keys, new_w = _pair_delta(new_rows, f, vocab_cap, +1)

    delta = jnp.zeros((vocab_cap * vocab_cap,), dtype=jnp.int32)
    delta = delta.at[old_keys].add(old_w, mode="drop")
    delta = delta.at[new_keys].add(new_w, mode="drop")

    # Write merged rows back (only valid slots; empty slots index N -> drop).
    scatter_rows = jnp.where(val_buf[:, None], new_rows, rows)
    new_words = words.at[idx_buf].set(scatter_rows, mode="drop")
    return new_words, delta, overflowed


def merge_step_incremental(
    state: IncState,
    step_index: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    affected_cap: int,
) -> IncState:
    """One merge step with incremental count maintenance (single device)."""
    st = state.core
    left, right, best_count = select_best_pair(
        state.counts, st.lex_rank, vocab_cap
    )
    stop_now = (best_count < max(min_frequency, 1)) | (best_count <= 0)
    stopped = st.stopped | stop_now
    do = ~stopped

    st, new_sym = vocab_update(
        st, left, right, do, stopped, step_index, vocab_cap
    )

    new_words, delta, overflowed = count_delta_and_apply(
        st.words, st.freqs, left, right, new_sym,
        vocab_cap=vocab_cap, affected_cap=affected_cap,
    )

    def incremental(_):
        return new_words, state.counts + delta

    def full(_):
        full_words = apply_pair_merge(st.words, left, right, new_sym)
        return full_words, pair_counts_dense(full_words, st.freqs, vocab_cap)

    words, counts = jax.lax.cond(overflowed, full, incremental, None)
    words = jnp.where(do, words, st.words)
    counts = jnp.where(do, counts, state.counts)
    return IncState(core=st._replace(words=words), counts=counts)


@partial(
    jax.jit,
    static_argnames=(
        "vocab_cap",
        "min_frequency",
        "num_merges",
        "chunk_size",
        "affected_cap",
    ),
    donate_argnums=(0,),
)
def merge_chunk_incremental(
    state: IncState,
    chunk_start: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    num_merges: int,
    chunk_size: int,
    affected_cap: int,
) -> IncState:
    """Run up to ``chunk_size`` incremental merge steps."""

    def body(i, s):
        step = chunk_start + i
        in_range = step < num_merges
        s_next = merge_step_incremental(
            s,
            jnp.minimum(step, num_merges - 1),
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            affected_cap=affected_cap,
        )
        return jax.tree.map(lambda a, b: jnp.where(in_range, a, b), s_next, s)

    return jax.lax.fori_loop(0, chunk_size, body, state)


def pick_affected_cap(num_rows: int) -> int:
    """Fixed gather-buffer size: small enough to keep deltas cheap, large
    enough that only the earliest merges overflow into the full recount."""
    cap = 256
    while cap < num_rows // 8 and cap < 4096:
        cap *= 2
    return min(cap, num_rows)


__all__ = [
    "IncState",
    "init_counts",
    "merge_step_incremental",
    "merge_chunk_incremental",
    "count_delta_and_apply",
    "pick_affected_cap",
]
