"""Sharded merge loop: shard_map over a (data[, vocab]) mesh.

SPMD layout (north star, BASELINE.json):

- word rows + frequencies: sharded over the ``data`` mesh axis;
- token table, lex ranks, merge record: replicated (every device applies
  identical updates, so replicated state stays bitwise-equal by
  construction);
- pair counts: a persistent table — replicated (1D mesh) or sharded by
  left-symbol rows over the ``vocab`` axis (2D mesh, for tables past one
  chip's HBM) — maintained incrementally: per-step sparse merge deltas
  are packed into tier-sized buffers, ``all_gather``ed over ``data``
  (hundreds of KB instead of the [V, V] table), and applied identically
  everywhere; the initial count and the rare overflow recount are the
  only ``psum``s of table-shaped data (integer adds commute, so results
  are exactly shard-count invariant).

The reference's only parallelism is thread-pooled ingestion
(/root/reference/src/yet_another_bpe/trainer.py:201-213); this module is
the device-parallel training layer it never had.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.dist.mesh import make_2d_mesh, make_data_mesh, put_global
from yabpe_tpu.kernels.pair_count import adjacent_pairs, pair_counts_dense
from yabpe_tpu.train.state import TrainState, init_state
from yabpe_tpu.utils.logging import get_logger

_LOG = get_logger(__name__)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def state_partition_specs() -> TrainState:
    """PartitionSpec per TrainState leaf (data-sharded words, rest replicated)."""
    return TrainState(
        words=P("data", None),
        freqs=P("data"),
        token_bytes=P(),
        token_len=P(),
        lex_rank=P(),
        next_id=P(),
        stopped=P(),
        merges=P(),
        num_done=P(),
    )


def _sharded_chunk_incremental(
    state,
    chunk_start: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    num_merges: int,
    chunk_size: int,
    affected_cap: int,
):
    """Incremental chunk body: replicated count table + all-gathered
    sparse deltas + lazy row-max selection.

    ``state`` is a BigState whose ``counts``/``row_max`` leaves are
    replicated and whose word rows are data-sharded. Each step, every
    device packs the delta keys/weights from its local affected rows into
    a fixed-capacity buffer and the buffers are ``all_gather``ed over
    ``data`` — a few hundred KB on the wire instead of the dense [V, V]
    table (4 GB at a 32k vocabulary) the previous psum design moved every
    step. Every device then applies the identical global update list to
    its replica, so the table — and the bigvocab-style row-max bound
    cache used for O(V) selection — stays bitwise-equal everywhere.

    Buffer capacities are tiered (``_tier_caps``): the tier is chosen by
    the pmax of the per-shard affected count, so every device takes the
    same ``lax.switch`` branch and the collectives inside the branches
    match. Past the top tier, every shard recounts its rows and the fresh
    table is psum'd (rare; first few merges only). Post-stop and
    out-of-range steps are provable no-ops (gated affected sets), so the
    loop carries no full-state masking copies.
    """
    from yabpe_tpu.kernels.merge_apply import apply_pair_merge
    from yabpe_tpu.train.bigvocab import BigState, lazy_select
    from yabpe_tpu.train.incremental import (
        affected_rows_and_tier,
        pack_merge_delta,
    )
    from yabpe_tpu.train.state import vocab_update

    oob = vocab_cap * vocab_cap

    def body(i, s):
        st = s.core
        step = chunk_start + i
        in_range = step < num_merges
        rec_idx = jnp.minimum(step, num_merges - 1)

        left, right, best_count, rm = lazy_select(
            s.counts, s.row_max, st.lex_rank, vocab_cap
        )
        stop_now = (
            (best_count < max(min_frequency, 1)) | (best_count <= 0)
        ) & in_range
        stopped = st.stopped | stop_now
        do = in_range & ~stopped

        st2, new_sym = vocab_update(
            st, left, right, do, stopped, rec_idx, vocab_cap
        )

        freqs = st2.freqs
        affected, tier_local, caps = affected_rows_and_tier(
            st2.words, left, right, do, affected_cap
        )
        # pmax -> identical tier on every device, so the collective inside
        # each switch branch is taken by all devices together.
        tier = jax.lax.pmax(tier_local, "data")

        def make_branch(cap: int):
            def branch(operands):
                words, counts, rm = operands
                words, keys, w = pack_merge_delta(
                    words, freqs, affected, left, right, new_sym,
                    cap, vocab_cap,
                )
                # ONE collective for (keys | weights): per-collective
                # latency, not payload, dominates cross-host steps.
                packed = jax.lax.all_gather(
                    jnp.stack([keys, w]), "data"
                )
                gkeys = packed[:, 0, :].reshape(-1)
                gw = packed[:, 1, :].reshape(-1)
                counts = counts.at[gkeys].add(gw, mode="drop")
                # Tighten-on-increase for the replicated bound cache.
                safe = jnp.minimum(gkeys, oob - 1)
                vals = jnp.where(gkeys < oob, counts[safe], -1)
                rm = rm.at[safe // vocab_cap].max(vals)
                return words, counts, rm

            return branch

        def full_branch(operands):
            # Only reachable when do is True on some shard; do is
            # replicated, so it is True everywhere and the ungated apply
            # and recount are correct on every shard.
            words, counts, rm = operands
            del counts, rm
            full_words = apply_pair_merge(words, left, right, new_sym)
            local = pair_counts_dense(full_words, freqs, vocab_cap)
            counts = jax.lax.psum(local, "data")
            rm = jnp.max(counts.reshape(vocab_cap, vocab_cap), axis=1)
            return full_words, counts, rm

        branches = [make_branch(c) for c in caps] + [full_branch]
        words, counts, rm = jax.lax.switch(
            tier, branches, (st2.words, s.counts, rm)
        )
        return BigState(
            core=st2._replace(words=words), counts=counts, row_max=rm
        )

    return jax.lax.fori_loop(0, chunk_size, body, state)


class Shard2DState(NamedTuple):
    """Per-device training state on the (data, vocab) mesh.

    ``slab`` is the dense pair-count table sharded by left-symbol rows
    over the ``vocab`` axis ([V*V] global, [V*V/nv] per device) and
    replicated over ``data``; ``row_max`` is the matching per-row
    upper-bound cache (bigvocab's lazy-selection structure, sharded).
    This is the configuration for count tables too large for one chip's
    HBM: no [V, V]-shaped buffer ever exists on a single device, and no
    [V, V]-shaped data ever moves per step.
    """

    core: TrainState
    slab: jax.Array     # [V*V] i32, P("vocab")
    row_max: jax.Array  # [V] i32, P("vocab")


def _slab_lazy_select(slab, rm, lex_rank, row_lo, rows_per: int, V: int):
    """Exact (count, global-left, right) max within this vocab shard's
    slab via lazy bound verification; returns the tightened bounds.

    A thin wrapper over :func:`yabpe_tpu.train.bigvocab.lazy_select_rows`:
    rows tie-break by the lex ranks of this shard's row slice, columns by
    the full lex table, and the winning row maps back to its global id.
    """
    from yabpe_tpu.train.bigvocab import lazy_select_rows

    lex_rows = jax.lax.dynamic_slice(lex_rank, (row_lo,), (rows_per,))
    m, a, b, rm = lazy_select_rows(slab, rm, lex_rows, lex_rank, V)
    return m, row_lo + a, b, rm


def _init_slab_body(words, freqs, *, vocab_cap: int, rows_per: int):
    """shard_map body: this vocab shard's initial count slab + row maxima
    (local count of the data shard's rows, psum'd over ``data``)."""
    vidx = jax.lax.axis_index("vocab")
    row_lo = vidx * rows_per
    left, right, valid = adjacent_pairs(words)
    in_slice = valid & (left >= row_lo) & (left < row_lo + rows_per)
    oob = rows_per * vocab_cap
    key = jnp.where(in_slice, (left - row_lo) * vocab_cap + right, oob)
    weight = jnp.where(in_slice, freqs[:, None], 0).astype(jnp.int32)
    slab = jnp.zeros((rows_per * vocab_cap,), dtype=jnp.int32)
    slab = slab.at[key.reshape(-1)].add(weight.reshape(-1), mode="drop")
    slab = jax.lax.psum(slab, "data")
    rm = jnp.max(slab.reshape(rows_per, vocab_cap), axis=1)
    return slab, rm


def _sharded_chunk_2d(
    state: Shard2DState,
    chunk_start: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    num_merges: int,
    chunk_size: int,
    vocab_shards: int,
    affected_cap: int,
) -> Shard2DState:
    """Chunk body for the (data, vocab) mesh — incremental slabs.

    Per step: every vocab shard lazily selects its slab-local exact best
    (bound cache + row re-scan), the global winner is the exact
    (count, lex-left, lex-right) tuple max of the all-gathered per-shard
    candidates, sparse merge deltas are packed into tier-sized buffers and
    all-gathered over ``data``, and each shard applies the slice of the
    identical global update list that lands in its rows. Past the top
    tier, each shard recounts its slab from its data shard's rows and
    psums over ``data`` (first few merges only).
    """
    from yabpe_tpu.kernels.merge_apply import apply_pair_merge
    from yabpe_tpu.train.incremental import (
        affected_rows_and_tier,
        pack_merge_delta,
    )
    from yabpe_tpu.train.state import vocab_update

    rows_per = vocab_cap // vocab_shards

    def body(i, s):
        st = s.core
        step = chunk_start + i
        in_range = step < num_merges
        rec_idx = jnp.minimum(step, num_merges - 1)
        vidx = jax.lax.axis_index("vocab")
        row_lo = vidx * rows_per

        m, left_g, right_g, rm = _slab_lazy_select(
            s.slab, s.row_max, st.lex_rank, row_lo, rows_per, vocab_cap
        )
        counts_v = jax.lax.all_gather(m, "vocab")
        lefts_v = jax.lax.all_gather(left_g, "vocab")
        rights_v = jax.lax.all_gather(right_g, "vocab")
        # exact tuple-order winner across vocab shards
        tie1 = counts_v == jnp.max(counts_v)
        s2 = jnp.where(tie1, st.lex_rank[lefts_v], -1)
        tie2 = tie1 & (s2 == jnp.max(s2))
        s3 = jnp.where(tie2, st.lex_rank[rights_v], -1)
        widx = jnp.argmax(s3)
        left = lefts_v[widx]
        right = rights_v[widx]
        best_count = counts_v[widx]

        stop_now = (
            (best_count < max(min_frequency, 1)) | (best_count <= 0)
        ) & in_range
        stopped = st.stopped | stop_now
        do = in_range & ~stopped

        st2, new_sym = vocab_update(
            st, left, right, do, stopped, rec_idx, vocab_cap
        )

        freqs = st2.freqs
        affected, tier_local, caps = affected_rows_and_tier(
            st2.words, left, right, do, affected_cap
        )
        # Words are replicated over "vocab", so tiers already agree along
        # it; pmax over "data" makes every device take the same branch.
        tier = jax.lax.pmax(tier_local, "data")

        slab_oob = rows_per * vocab_cap

        def make_branch(cap: int):
            def branch(operands):
                words, slab, rm = operands
                words, keys, w = pack_merge_delta(
                    words, freqs, affected, left, right, new_sym,
                    cap, vocab_cap,
                )
                packed = jax.lax.all_gather(
                    jnp.stack([keys, w]), "data"
                )
                gkeys = packed[:, 0, :].reshape(-1)
                gw = packed[:, 1, :].reshape(-1)

                # Apply the slice of the global update list that lands in
                # this shard's rows (out-of-slab keys drop).
                lk = gkeys - row_lo * vocab_cap
                in_slab = (lk >= 0) & (lk < slab_oob)
                lk = jnp.where(in_slab, lk, slab_oob)
                slab = slab.at[lk].add(
                    jnp.where(in_slab, gw, 0), mode="drop"
                )

                # Tighten-on-increase: gather post-update values at the
                # touched in-slab cells and scatter-max into the bounds.
                safe = jnp.minimum(lk, slab_oob - 1)
                vals = jnp.where(in_slab, slab[safe], -1)
                rm2 = rm.at[safe // vocab_cap].max(vals)
                return words, slab, rm2

            return branch

        def full_branch(operands):
            # Only reachable when do is True (replicated), so the ungated
            # full apply + recount is correct on every shard.
            words, slab, rm = operands
            del slab, rm
            full_words = apply_pair_merge(words, left, right, new_sym)
            slab, rm = _init_slab_body(
                full_words, freqs, vocab_cap=vocab_cap, rows_per=rows_per
            )
            return full_words, slab, rm

        branches = [make_branch(c) for c in caps] + [full_branch]
        words, slab, rm = jax.lax.switch(
            tier, branches, (st2.words, s.slab, rm)
        )
        return Shard2DState(
            core=st2._replace(words=words), slab=slab, row_max=rm
        )

    return jax.lax.fori_loop(0, chunk_size, body, state)


def run_sharded_merge_loop(
    table: WordTable,
    base_vocab: Vocab,
    *,
    vocab_cap: int,
    num_merges: int,
    min_frequency: int,
    data_shards: int,
    vocab_shards: int = 1,
    chunk_size: int = 256,
    resume: tuple[np.ndarray, int] | None = None,
    on_chunk=None,
    spec_batch: int = 0,
    stats_out: dict | None = None,
) -> np.ndarray:
    """Run the merge loop sharded over a (data[, vocab]) mesh.

    Word rows are data-parallel; with ``vocab_shards > 1`` the dense pair
    table is additionally sharded by left-symbol rows. Returns the
    [num_merges, 3] merge record (host numpy), identical to the
    single-device loop's output for any shard configuration.
    ``resume=(merges_ids, steps_done)`` replays a checkpoint before
    continuing; ``on_chunk(merges_ids, steps_done)`` fires after every
    chunk for checkpoint saving.

    ``spec_batch > 1`` (1D meshes only) batches that many merges per
    collective round via speculate/validate epochs (dist/speculative.py) —
    the latency-tolerant mode for multi-host meshes where one collective
    per merge would dominate wall clock. Results stay bit-identical.
    """
    if vocab_shards > 1:
        mesh = make_2d_mesh(data_shards, vocab_shards)
        vocab_cap = _round_up(vocab_cap, vocab_shards)
    else:
        mesh = make_data_mesh(data_shards)
    table = table.pad_rows_to(_round_up(table.words.shape[0], data_shards))
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

    chunk = max(1, min(chunk_size, num_merges))
    core_specs = state_partition_specs()
    if vocab_shards > 1:
        from yabpe_tpu.train.incremental import pick_affected_cap

        rows_per_shard = table.words.shape[0] // data_shards
        rows_per_vshard = vocab_cap // vocab_shards
        body = partial(
            _sharded_chunk_2d,
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            num_merges=num_merges,
            chunk_size=chunk,
            vocab_shards=vocab_shards,
            affected_cap=pick_affected_cap(rows_per_shard),
        )
        core = put_global(
            core,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s), core_specs,
                is_leaf=lambda x: isinstance(x, P),
            ),
        )
        init_fn = jax.jit(
            shard_map(
                partial(
                    _init_slab_body,
                    vocab_cap=vocab_cap,
                    rows_per=rows_per_vshard,
                ),
                mesh=mesh,
                in_specs=(core_specs.words, core_specs.freqs),
                out_specs=(P("vocab"), P("vocab")),
                check_vma=False,
            )
        )
        slab, row_max = init_fn(core.words, core.freqs)
        state = Shard2DState(core=core, slab=slab, row_max=row_max)
        specs = Shard2DState(
            core=core_specs, slab=P("vocab"), row_max=P("vocab")
        )
    else:
        from yabpe_tpu.train.bigvocab import BigState
        from yabpe_tpu.train.incremental import init_counts, pick_affected_cap

        rows_per_shard = table.words.shape[0] // data_shards
        body = partial(
            _sharded_chunk_incremental,
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            num_merges=num_merges,
            chunk_size=chunk,
            affected_cap=pick_affected_cap(rows_per_shard),
        )
        counts0 = init_counts(core.words, core.freqs, vocab_cap=vocab_cap)
        state = BigState(
            core=core,
            counts=counts0,
            row_max=jnp.max(counts0.reshape(vocab_cap, vocab_cap), axis=1),
        )
        specs = BigState(core=core_specs, counts=P(), row_max=P())

    state = put_global(
        state,
        jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                     is_leaf=lambda x: isinstance(x, P)),
    )
    fn = jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(specs, P()),
            out_specs=specs,
            check_vma=False,
        ),
        donate_argnums=(0,),
    )

    if spec_batch > 1 and vocab_shards > 1:
        _LOG.warning(
            "spec_batch=%d ignored: speculative epochs need the replicated "
            "frozen count table for communication-free selection, which a "
            "vocab-sharded ([V/nv, V] per device) mesh does not hold; the "
            "2D loop runs lockstep (see BBPETrainerConfig docs)",
            spec_batch,
        )
    if spec_batch > 1 and vocab_shards == 1:
        return _run_speculative(
            state, specs, mesh, fn,
            vocab_cap=vocab_cap,
            num_merges=num_merges,
            min_frequency=min_frequency,
            chunk=chunk,
            start_step=start_step,
            spec_batch=spec_batch,
            affected_cap=pick_affected_cap(rows_per_shard),
            on_chunk=on_chunk,
            stats_out=stats_out,
        )

    start = start_step
    while start < num_merges:
        state = fn(state, jnp.asarray(start, dtype=jnp.int32))
        start += chunk
        if on_chunk is not None:
            on_chunk(np.asarray(state.core.merges), min(start, num_merges))
        if bool(state.core.stopped):
            break
    return np.asarray(state.core.merges)


def _run_speculative(
    state,
    specs,
    mesh,
    single_chunk_fn,
    *,
    vocab_cap: int,
    num_merges: int,
    min_frequency: int,
    chunk: int,
    start_step: int,
    spec_batch: int,
    affected_cap: int,
    on_chunk,
    stats_out: dict | None = None,
) -> np.ndarray:
    """Drive speculate/validate epochs; fall back to the tiered per-merge
    body for any merge whose epoch made no progress (cap0 overflow).

    k (merges speculated per collective round) ADAPTS to the observed
    commit rate between chunks: misprediction wastes k-p word-shard
    scans per epoch, so a low commits/epoch rate halves k (less wasted
    compute) and a high one doubles it (fewer collectives). Variants
    compile lazily per k and results are bit-identical for any k
    schedule (epochs are independent).
    """
    from yabpe_tpu.dist.speculative import sharded_chunk_speculative
    from yabpe_tpu.utils.logging import get_logger

    log = get_logger(__name__)
    cap0 = affected_cap
    cap = min(256, cap0)
    fns: dict[int, object] = {}

    def spec_fn_for(k: int):
        if k not in fns:
            fns[k] = jax.jit(
                shard_map(
                    partial(
                        sharded_chunk_speculative,
                        vocab_cap=vocab_cap,
                        min_frequency=min_frequency,
                        num_merges=num_merges,
                        chunk_size=chunk,
                        spec_batch=k,
                        cap0=cap0,
                        cap=cap,
                    ),
                    mesh=mesh,
                    in_specs=(specs, P()),
                    out_specs=(specs, P(), P()),
                    check_vma=False,
                ),
                donate_argnums=(0,),
            )
        return fns[k]

    k = max(2, min(spec_batch, num_merges))
    k_max = max(k, 16)
    total_epochs = 0
    total_spec_commits = 0
    fallbacks = 0
    start = start_step
    while start < num_merges:
        chunk_end = min(start + chunk, num_merges)
        state, ptr, epochs = spec_fn_for(k)(
            state, jnp.asarray(start, dtype=jnp.int32)
        )
        ptr = int(np.asarray(ptr))
        epochs = int(np.asarray(epochs))
        total_epochs += epochs
        total_spec_commits += ptr - start
        if epochs > 0:
            # The k-p mispredicted merges per epoch are thrown-away
            # word-shard work, so k halves when validation accepts under
            # ~30% of speculation and recovers (up to the configured
            # spec_batch) only when epochs nearly saturate. Tracking
            # "2x commits/epoch" instead was measured WORSE (29.5 s vs
            # 16.4 s at 2x128 MB): commits/epoch saturates at k, so that
            # rule doubles k forever and burns the saving in waste.
            rate = (ptr - start) / (epochs * k)
            if rate < 0.3 and k > 4:
                k //= 2
            elif rate > 0.85 and k < k_max:
                k *= 2
        if ptr < chunk_end and not bool(state.core.stopped):
            # No-progress epoch: merge ``ptr``'s delta overflowed the
            # fixed speculation capacity on some host (heavy early
            # merges). Advance a chunk through the tiered per-merge body
            # (which escalates capacities up to the full recount).
            fallbacks += 1
            state = single_chunk_fn(state, jnp.asarray(ptr, jnp.int32))
            ptr = min(ptr + chunk, num_merges)
        start = ptr
        if on_chunk is not None:
            on_chunk(np.asarray(state.core.merges), min(start, num_merges))
        if bool(state.core.stopped):
            break
    commits_per_epoch = total_spec_commits / max(total_epochs, 1)
    log.info(
        "speculative loop: %d merges in %d epochs (%.2f commits/epoch), "
        "%d fallback chunks, final k=%d",
        total_spec_commits, total_epochs, commits_per_epoch, fallbacks, k,
    )
    if stats_out is not None:
        stats_out.update(
            spec_epochs=total_epochs,
            spec_commits=total_spec_commits,
            commits_per_epoch=commits_per_epoch,
            fallback_chunks=fallbacks,
            final_k=k,
        )
    return np.asarray(state.core.merges)


__all__ = ["run_sharded_merge_loop", "state_partition_specs"]
