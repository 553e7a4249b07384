"""Large-vocabulary merge loop: HBM count table + lazy row-max selection.

The dense [V, V] count table for a 32k-merge vocabulary is 4 GB — far past
VMEM but comfortable in HBM. The costly part is selection: a full-table
argmax per step reads the whole 4 GB. This driver keeps a per-row maximum
cache (``row_max``) that is maintained as an *upper bound*:

- increases are folded in eagerly (scatter-max of the post-update values at
  every cell the delta touched);
- decreases may leave a stale bound, which selection repairs lazily: pick
  the lex-greatest row among rows whose bound equals the global bound
  maximum, re-scan just that row, and either confirm (bound tight -> it is
  the true global max, since every other row's true max is below its own
  bound <= this one) or tighten and retry. Stale tops are rare, so the
  verify loop almost always runs once.

Per-step cost becomes O(V + affected*width) instead of O(V^2), which makes
single-chip 32k-merge training tractable. Semantics are bit-identical to
the reference loop (same tie-breaking, dedup, min-frequency stop).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.train.incremental import pick_affected_cap, tiered_count_update
from yabpe_tpu.train.state import (
    TrainState,
    count_pairs,
    init_state,
    vocab_update,
)


class BigState(NamedTuple):
    core: TrainState
    counts: jax.Array   # [V*V] i32
    row_max: jax.Array  # [V] i32 upper bound on each row's max


def lazy_select_rows(
    table_flat: jax.Array,
    row_max: jax.Array,
    lex_rows: jax.Array,
    lex_cols: jax.Array,
    row_width: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Exact (count m, row a, col b) maximum of a flattened [rows, width]
    table via lazy bound verification.

    ``row_max`` is a per-row upper bound; the loop repeatedly picks the
    lex-greatest row (by ``lex_rows``) whose bound equals the global bound
    maximum, re-scans just that row, and either confirms or tightens and
    retries. Columns tie-break by ``lex_cols``. Shared by the single-chip
    bigvocab table (rows == full vocab) and the vocab-sharded slabs
    (rows == this shard's slice). Returns the tightened bounds too.

    (A batched variant — re-scan the k lex-greatest candidates per
    iteration — was measured slower at a 32k vocabulary: the extra
    per-iteration argmax/scatter/take ops cost more than the iterations
    they save, and lax.top_k lowers to a full sort on TPU.)
    """

    def cond(carry):
        _, _, ok = carry
        return jnp.logical_not(ok)

    def body(carry):
        rm, _, _ = carry
        m = jnp.max(rm)
        cand = rm == m
        a = jnp.argmax(jnp.where(cand, lex_rows, -1)).astype(jnp.int32)
        row = jax.lax.dynamic_slice(table_flat, (a * row_width,), (row_width,))
        true_max = jnp.max(row)
        ok = true_max == m
        rm = rm.at[a].set(true_max)
        return (rm, a, ok)

    row_max, a, _ = jax.lax.while_loop(
        cond, body, (row_max, jnp.int32(0), jnp.bool_(False))
    )
    m = jnp.max(row_max)
    row = jax.lax.dynamic_slice(table_flat, (a * row_width,), (row_width,))
    b = jnp.argmax(jnp.where(row == m, lex_cols, -1)).astype(jnp.int32)
    return m, a, b, row_max


def lazy_select(
    counts_flat: jax.Array,
    row_max: jax.Array,
    lex_rank: jax.Array,
    vocab_cap: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Exact (left, right, count) via bound verification; returns updated
    row_max with any stale tops tightened."""
    m, a, b, row_max = lazy_select_rows(
        counts_flat, row_max, lex_rank, lex_rank, vocab_cap
    )
    return a, b, m, row_max


def lazy_select_2d(
    counts2d: jax.Array,
    row_max: jax.Array,
    lex_rank: jax.Array,
    vocab_cap: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """`lazy_select` over a [V, V] table.

    Same semantics (exact (count, lex-greatest) selection via lazy bound
    verification), but no flat ``a * V + b`` index ever forms, so it is
    safe past the i32 flat-index bound (V > 46340) — the wide-vocab
    kernel-sharded loop's selection path (VERDICT r4 #6).
    """
    V = vocab_cap

    def cond(carry):
        _, _, ok = carry
        return jnp.logical_not(ok)

    def body(carry):
        rm, _, _ = carry
        m = jnp.max(rm)
        cand = rm == m
        a = jnp.argmax(jnp.where(cand, lex_rank, -1)).astype(jnp.int32)
        row = jax.lax.dynamic_slice(counts2d, (a, jnp.int32(0)), (1, V))
        true_max = jnp.max(row)
        ok = true_max == m
        rm = rm.at[a].set(true_max)
        return (rm, a, ok)

    row_max, a, _ = jax.lax.while_loop(
        cond, body, (row_max, jnp.int32(0), jnp.bool_(False))
    )
    m = jnp.max(row_max)
    row = jax.lax.dynamic_slice(counts2d, (a, jnp.int32(0)), (1, V))[0]
    b = jnp.argmax(jnp.where(row == m, lex_rank, -1)).astype(jnp.int32)
    return a, b, m, row_max


def merge_step_big(
    state: BigState,
    step_index: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    affected_cap: int,
    in_range: jax.Array | bool = True,
    count_strategy: str = "dense",
) -> BigState:
    """One merge step: O(V + affected x width) HBM traffic.

    The count table is updated by gated scatter-adds (never a full-table
    add or select), and skipped steps (post-stop / past num_merges) are
    no-ops by construction, so no full-state masking copy exists anywhere
    on the per-step path — essential when the [V, V] table is gigabytes.
    """
    V = vocab_cap
    st = state.core
    left, right, best_count, row_max = lazy_select(
        state.counts, state.row_max, st.lex_rank, V
    )
    stop_now = (
        (best_count < max(min_frequency, 1)) | (best_count <= 0)
    ) & in_range
    stopped = st.stopped | stop_now
    do = in_range & ~stopped

    st, new_sym = vocab_update(
        st, left, right, do, stopped, step_index, vocab_cap
    )

    words, counts, rm = tiered_count_update(
        st.words, st.freqs, state.counts, left, right, new_sym,
        vocab_cap=V, affected_cap=affected_cap, gate=do, row_max=row_max,
        count_strategy=count_strategy,
    )
    return BigState(core=st._replace(words=words), counts=counts, row_max=rm)


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
def merge_chunk_big(
    state: BigState,
    chunk_start: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    num_merges: int,
    chunk_size: int,
    affected_cap: int,
    count_strategy: str = "dense",
) -> BigState:
    def body(i, s):
        step = chunk_start + i
        return merge_step_big(
            s,
            jnp.minimum(step, num_merges - 1),
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            affected_cap=affected_cap,
            in_range=step < num_merges,
            count_strategy=count_strategy,
        )

    return jax.lax.fori_loop(0, chunk_size, body, state)


def run_bigvocab_merge_loop(
    table: WordTable,
    base_vocab: Vocab,
    *,
    vocab_cap: int,
    num_merges: int,
    min_frequency: int,
    chunk_size: int = 256,
    resume: tuple[np.ndarray, int] | None = None,
    on_chunk=None,
    count_strategy: str = "dense",
) -> np.ndarray:
    """Driver: returns the [num_merges, 3] merge record.

    ``resume=(merges_ids, steps_done)`` rebuilds the state by replaying
    the recorded merges (yabpe_tpu.train.checkpoint); the count table and
    row-max bounds are then recomputed from the replayed words here.
    ``on_chunk(merges_ids, steps_done)`` is invoked after every chunk for
    checkpoint saving.
    """
    start_step = 0
    if resume is not None:
        from yabpe_tpu.train.checkpoint import resume_state

        merges_ids, steps_done = resume
        start_step = min(int(steps_done), num_merges)
        core = resume_state(
            table, base_vocab, vocab_cap, num_merges, merges_ids, start_step
        )
    else:
        core = init_state(table, base_vocab, vocab_cap, num_merges)
    counts = count_pairs(core.words, core.freqs, vocab_cap, count_strategy)
    row_max = jnp.max(counts.reshape(vocab_cap, vocab_cap), axis=1)
    state = BigState(core=core, counts=counts, row_max=row_max)
    affected_cap = pick_affected_cap(int(core.words.shape[0]))

    chunk = max(1, min(chunk_size, num_merges))
    start = start_step
    while start < num_merges:
        state = merge_chunk_big(
            state,
            jnp.asarray(start, dtype=jnp.int32),
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            num_merges=num_merges,
            chunk_size=chunk,
            affected_cap=affected_cap,
            count_strategy=count_strategy,
        )
        start += chunk
        if on_chunk is not None:
            on_chunk(np.asarray(state.core.merges), min(start, num_merges))
        if bool(state.core.stopped):
            break
    return np.asarray(state.core.merges)


__all__ = [
    "BigState",
    "lazy_select",
    "merge_step_big",
    "merge_chunk_big",
    "run_bigvocab_merge_loop",
]
