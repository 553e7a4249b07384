"""Incremental merge loop: persistent count table + affected-row deltas.

TPU-native analogue of the reference's incremental bookkeeping
(/root/reference/src/yet_another_bpe/trainer.py:253-294): the dense pair
count table lives on device as training state, and each merge step updates
only the rows containing the merged pair — gathered into a fixed-capacity
buffer via a cumsum-slot scatter — subtracting their old adjacent-pair
counts and adding the new ones. When more rows are affected than the buffer
holds (the first few merges), the step falls back to the full
recount + full-table apply. Per-step device work drops from
O(total symbols) to O(affected x width) for the overwhelming majority of
steps, and the data-parallel path all-gathers the same small sparse
deltas instead of moving any [V, V]-shaped buffer (dist/sharded.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from yabpe_tpu.kernels.merge_apply import apply_pair_merge
from yabpe_tpu.kernels.pair_count import adjacent_pairs
from yabpe_tpu.kernels.select import select_best_pair
from yabpe_tpu.train.state import TrainState, count_pairs, vocab_update


class IncState(NamedTuple):
    core: TrainState
    counts: jax.Array  # [V*V] int32, persistent


@partial(jax.jit, static_argnames=("vocab_cap", "count_strategy"))
def init_counts(
    words: jax.Array,
    freqs: jax.Array,
    *,
    vocab_cap: int,
    count_strategy: str = "dense",
) -> jax.Array:
    return count_pairs(words, freqs, vocab_cap, count_strategy)


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


def _tier_caps(affected_cap: int) -> tuple[int, ...]:
    """Ascending capacity tiers up to ``affected_cap``.

    XLA scatter cost on TPU is proportional to the *buffer* size (dropped
    out-of-bounds slots are still processed serially), so most steps —
    which affect only a handful of rows — should pay for a small buffer.
    A ``lax.switch`` escalates to larger tiers by the actual affected
    count, and past the top tier to the full recount. The 16-row bottom
    tier matters most for the data-sharded loop: the per-step collective
    payload and the replicated scatter of the all-gathered delta both
    scale with shards x tier size, and typical steps affect only a
    handful of rows per shard.
    """
    caps = []
    c = 16
    while c < affected_cap:
        caps.append(c)
        c *= 8
    caps.append(affected_cap)
    return tuple(caps)


def affected_rows_and_tier(
    words: jax.Array,
    left: jax.Array,
    right: jax.Array,
    gate: jax.Array | bool,
    affected_cap: int,
) -> tuple[jax.Array, jax.Array, tuple[int, ...]]:
    """Rows containing the merged pair, plus the capacity tier they need.

    Returns (affected bool [N], tier scalar, caps). ``tier == len(caps)``
    means no tier holds them (callers fall back to a full recount).
    ``gate=False`` empties the affected set, making every consumer a
    provable no-op.
    """
    l = words[:, :-1]
    r = words[:, 1:]
    affected = jnp.any((l == left) & (r == right) & (l >= 0), axis=1) & gate
    n_aff = jnp.sum(affected.astype(jnp.int32))
    caps = _tier_caps(affected_cap)
    tier = jnp.int32(0)
    for c in caps:
        tier = tier + (n_aff > c).astype(jnp.int32)
    return affected, tier, caps


def pack_merge_delta(
    words: jax.Array,
    freqs: jax.Array,
    affected: jax.Array,
    left: jax.Array,
    right: jax.Array,
    new_sym: jax.Array,
    cap: int,
    vocab_cap: int,
    slots: tuple[jax.Array, jax.Array] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One merge's sparse count delta at a fixed buffer capacity.

    Gathers the ``affected`` rows into a [cap]-slot buffer, applies the
    merge to them, writes the merged rows back, and packs the old/new
    adjacent-pair (keys, weights) — the single shared scaffolding used by
    the single-device tiers and both sharded bodies (which differ only in
    the collective and the table the keys land in). Empty slots and
    padding emit out-of-bounds keys with zero weight, so applying the
    delta is a no-op wherever the buffer is not full. Exact only when the
    affected rows actually fit ``cap``.

    ``slots`` lets the caller pass a precomputed ``_affected_slots``
    result (the speculative epochs keep it for the cheap commit replay).

    Returns (new_words, keys [cap*2*(W-1)], weights).
    """
    n = words.shape[0]
    idx_buf, val_buf = (
        slots if slots is not None else _affected_slots(affected, cap)
    )
    safe_idx = jnp.minimum(idx_buf, n - 1)
    rows = words[safe_idx]
    f = jnp.where(val_buf, freqs[safe_idx], 0)

    old_keys, old_w = _pair_delta(rows, f, vocab_cap, -1)
    new_rows = apply_pair_merge(rows, left, right, new_sym)
    new_keys, new_w = _pair_delta(new_rows, f, vocab_cap, +1)

    keys = jnp.concatenate([old_keys, new_keys])
    weights = jnp.concatenate([old_w, new_w])

    scatter_rows = jnp.where(val_buf[:, None], new_rows, rows)
    new_words = words.at[idx_buf].set(scatter_rows, mode="drop")
    return new_words, keys, weights


def tiered_count_update(
    words: jax.Array,
    freqs: jax.Array,
    counts: jax.Array,
    left: jax.Array,
    right: jax.Array,
    new_sym: jax.Array,
    *,
    vocab_cap: int,
    affected_cap: int,
    gate: jax.Array | bool = True,
    row_max: jax.Array | None = None,
    count_strategy: str = "dense",
) -> tuple[jax.Array, jax.Array, jax.Array | None]:
    """Apply one merge to (words, counts[, row_max]) with tiered buffers.

    Selects the smallest capacity tier that holds the affected rows and
    runs the gather/delta/scatter pipeline at that size; above the top
    tier, falls back to the exact full recount. ``row_max`` (the bigvocab
    per-row upper-bound cache) is maintained by gathering post-update
    values at touched cells and scatter-maxing — tight for increases.
    Returns (words, counts, row_max-or-None).
    """
    V = vocab_cap
    affected, tier, caps = affected_rows_and_tier(
        words, left, right, gate, affected_cap
    )

    has_rm = row_max is not None
    rm_in = row_max if has_rm else jnp.zeros((1,), jnp.int32)

    def make_branch(cap: int):
        def branch(operands):
            words, counts, rm = operands
            words, keys, w = pack_merge_delta(
                words, freqs, affected, left, right, new_sym, cap, V
            )
            counts = counts.at[keys].add(w, mode="drop")
            if has_rm:
                safe = jnp.minimum(keys, V * V - 1)
                vals = jnp.where(keys < V * V, counts[safe], -1)
                rm = rm.at[safe // V].max(vals)
            return words, counts, rm

        return branch

    def full_branch(operands):
        words, counts, rm = operands
        del counts
        full_words = apply_pair_merge(words, left, right, new_sym)
        counts = count_pairs(full_words, freqs, V, count_strategy)
        if has_rm:
            rm = jnp.max(counts.reshape(V, V), axis=1)
        return full_words, counts, rm

    branches = [make_branch(c) for c in caps] + [full_branch]
    words, counts, rm = jax.lax.switch(
        tier, branches, (words, counts, rm_in)
    )
    return words, counts, (rm if has_rm else None)


def merge_step_incremental(
    state: IncState,
    step_index: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    affected_cap: int,
    in_range: jax.Array | bool = True,
    count_strategy: str = "dense",
) -> IncState:
    """One merge step with incremental count maintenance (single device).

    Out-of-range / post-stop steps are no-ops by construction (gated
    scatters), so the chunk loop needs no full-state masking copy.
    """
    st = state.core
    left, right, best_count = select_best_pair(
        state.counts, st.lex_rank, vocab_cap
    )
    stop_now = (
        (best_count < max(min_frequency, 1)) | (best_count <= 0)
    ) & in_range
    stopped = st.stopped | stop_now
    do = in_range & ~stopped

    st, new_sym = vocab_update(
        st, left, right, do, stopped, step_index, vocab_cap
    )

    words, counts, _ = tiered_count_update(
        st.words, st.freqs, state.counts, left, right, new_sym,
        vocab_cap=vocab_cap, affected_cap=affected_cap, gate=do,
        count_strategy=count_strategy,
    )
    return IncState(core=st._replace(words=words), counts=counts)


@partial(
    jax.jit,
    static_argnames=(
        "vocab_cap",
        "min_frequency",
        "num_merges",
        "chunk_size",
        "affected_cap",
        "count_strategy",
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
    count_strategy: str = "dense",
) -> IncState:
    """Run up to ``chunk_size`` incremental merge steps."""

    def body(i, s):
        step = chunk_start + i
        return merge_step_incremental(
            s,
            jnp.minimum(step, num_merges - 1),
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            affected_cap=affected_cap,
            in_range=step < num_merges,
            count_strategy=count_strategy,
        )

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
    "tiered_count_update",
    "pick_affected_cap",
]
