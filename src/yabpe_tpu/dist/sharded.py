"""Data-parallel sharded merge loop: shard_map + psum over the mesh.

SPMD layout (north star, BASELINE.json):

- word rows + frequencies: sharded over the ``data`` mesh axis;
- token table, lex ranks, merge record: replicated (every device applies
  identical updates — the argmax inputs are identical after the psum, so
  replicated state stays bitwise-equal by construction);
- per-step pair counts: computed locally, reduced with ``jax.lax.psum``
  over ``data`` (integer adds commute, so the result — and therefore the
  whole training run — is exactly shard-count invariant).

The reference's only parallelism is thread-pooled ingestion
(/root/reference/src/yet_another_bpe/trainer.py:201-213); this module is
the device-parallel training layer it never had.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.dist.mesh import make_2d_mesh, make_data_mesh
from yabpe_tpu.kernels.pair_count import adjacent_pairs, pair_counts_dense
from yabpe_tpu.train.state import TrainState, init_state, merge_step


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
    sparse deltas.

    ``state`` is an IncState whose ``counts`` leaf is replicated and whose
    word rows are data-sharded. Each step, every device packs the delta
    keys/weights from its local affected rows into a fixed-capacity buffer
    and the buffers are ``all_gather``ed over ``data`` — a few hundred KB
    on the wire instead of the dense [V, V] table (4 GB at a 32k
    vocabulary) the previous psum design moved every step. Every device
    then applies the identical global update list to its replica, so the
    table stays bitwise-equal everywhere.

    Buffer capacities are tiered (``_tier_caps``): the tier is chosen by
    the pmax of the per-shard affected count, so every device takes the
    same ``lax.switch`` branch and the collectives inside the branches
    match. Past the top tier, every shard recounts its rows and the fresh
    table is psum'd (rare; first few merges only). Post-stop and
    out-of-range steps are provable no-ops (gated affected sets), so the
    loop carries no full-state masking copies.
    """
    from yabpe_tpu.kernels.merge_apply import apply_pair_merge
    from yabpe_tpu.kernels.select import select_best_pair
    from yabpe_tpu.train.incremental import (
        IncState,
        _affected_slots,
        _pair_delta,
        _tier_caps,
    )
    from yabpe_tpu.train.state import vocab_update

    caps = _tier_caps(affected_cap)

    def body(i, s):
        st = s.core
        step = chunk_start + i
        in_range = step < num_merges
        rec_idx = jnp.minimum(step, num_merges - 1)

        left, right, best_count = select_best_pair(
            s.counts, st.lex_rank, vocab_cap
        )
        stop_now = (
            (best_count < max(min_frequency, 1)) | (best_count <= 0)
        ) & in_range
        stopped = st.stopped | stop_now
        do = in_range & ~stopped

        st2, new_sym = vocab_update(
            st, left, right, do, stopped, rec_idx, vocab_cap
        )

        words_in = st2.words
        freqs = st2.freqs
        n = words_in.shape[0]
        l = words_in[:, :-1]
        r = words_in[:, 1:]
        affected = jnp.any((l == left) & (r == right) & (l >= 0), axis=1) & do
        n_aff = jnp.sum(affected.astype(jnp.int32))
        tier_local = jnp.int32(0)
        for c in caps:
            tier_local = tier_local + (n_aff > c).astype(jnp.int32)
        # pmax -> identical tier on every device, so the collective inside
        # each switch branch is taken by all devices together.
        tier = jax.lax.pmax(tier_local, "data")

        def make_branch(cap: int):
            def branch(operands):
                words, counts = operands
                idx_buf, val_buf = _affected_slots(affected, cap)
                safe_idx = jnp.minimum(idx_buf, n - 1)
                rows = words[safe_idx]
                f = jnp.where(val_buf, freqs[safe_idx], 0)

                old_keys, old_w = _pair_delta(rows, f, vocab_cap, -1)
                new_rows = apply_pair_merge(rows, left, right, new_sym)
                new_keys, new_w = _pair_delta(new_rows, f, vocab_cap, +1)

                keys = jnp.concatenate([old_keys, new_keys])
                w = jnp.concatenate([old_w, new_w])
                gkeys = jax.lax.all_gather(keys, "data").reshape(-1)
                gw = jax.lax.all_gather(w, "data").reshape(-1)
                counts = counts.at[gkeys].add(gw, mode="drop")

                scatter_rows = jnp.where(val_buf[:, None], new_rows, rows)
                words = words.at[idx_buf].set(scatter_rows, mode="drop")
                return words, counts

            return branch

        def full_branch(operands):
            # Only reachable when do is True on some shard; do is
            # replicated, so it is True everywhere and the ungated apply
            # and recount are correct on every shard.
            words, counts = operands
            del counts
            full_words = apply_pair_merge(words, left, right, new_sym)
            local = pair_counts_dense(full_words, freqs, vocab_cap)
            return full_words, jax.lax.psum(local, "data")

        branches = [make_branch(c) for c in caps] + [full_branch]
        words, counts = jax.lax.switch(tier, branches, (words_in, s.counts))
        return IncState(core=st2._replace(words=words), counts=counts)

    return jax.lax.fori_loop(0, chunk_size, body, state)


def _sharded_chunk_2d(
    state: TrainState,
    chunk_start: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    num_merges: int,
    chunk_size: int,
    vocab_shards: int,
) -> TrainState:
    """Chunk body for the (data, vocab) mesh.

    Each device counts pairs only for its slice of left-symbol rows (the
    dense table is sharded [V/nv, V] per device), psums over ``data``,
    selects its slice-local best, and the global winner is chosen from the
    all-gathered per-slice candidates with the exact (count, lex-left,
    lex-right) tuple order — replicated-deterministic on every device.
    """
    rows_per = vocab_cap // vocab_shards
    vidx = jax.lax.axis_index("vocab")
    row_lo = vidx * rows_per

    def local_best(st: TrainState):
        left, right, valid = adjacent_pairs(st.words)
        in_slice = valid & (left >= row_lo) & (left < row_lo + rows_per)
        oob = rows_per * vocab_cap
        key = jnp.where(in_slice, (left - row_lo) * vocab_cap + right, oob)
        weight = jnp.where(in_slice, st.freqs[:, None], 0).astype(jnp.int32)
        local = jnp.zeros((rows_per * vocab_cap,), dtype=jnp.int32)
        local = local.at[key.reshape(-1)].add(weight.reshape(-1), mode="drop")
        counts = jax.lax.psum(local, "data").reshape(rows_per, vocab_cap)

        lex_slice = jax.lax.dynamic_slice(st.lex_rank, (row_lo,), (rows_per,))
        m = jnp.max(counts)
        cand = counts == m
        row_has = jnp.any(cand, axis=1)
        li = jnp.argmax(jnp.where(row_has, lex_slice, -1)).astype(jnp.int32)
        left_g = row_lo + li
        right_g = jnp.argmax(
            jnp.where(cand[li], st.lex_rank, -1)
        ).astype(jnp.int32)
        return m, left_g, right_g

    def body(i, st):
        step = chunk_start + i
        m, left_g, right_g = local_best(st)
        counts_v = jax.lax.all_gather(m, "vocab")
        lefts_v = jax.lax.all_gather(left_g, "vocab")
        rights_v = jax.lax.all_gather(right_g, "vocab")
        # exact tuple-order winner across vocab shards
        tie1 = counts_v == jnp.max(counts_v)
        s2 = jnp.where(tie1, st.lex_rank[lefts_v], -1)
        tie2 = tie1 & (s2 == jnp.max(s2))
        s3 = jnp.where(tie2, st.lex_rank[rights_v], -1)
        widx = jnp.argmax(s3)
        best = (lefts_v[widx], rights_v[widx], counts_v[widx])
        return merge_step(
            st,
            jnp.minimum(step, num_merges - 1),
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            best=best,
            in_range=step < num_merges,
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
) -> np.ndarray:
    """Run the merge loop sharded over a (data[, vocab]) mesh.

    Word rows are data-parallel; with ``vocab_shards > 1`` the dense pair
    table is additionally sharded by left-symbol rows. Returns the
    [num_merges, 3] merge record (host numpy), identical to the
    single-device loop's output for any shard configuration.
    """
    if vocab_shards > 1:
        mesh = make_2d_mesh(data_shards, vocab_shards)
        vocab_cap = _round_up(vocab_cap, vocab_shards)
    else:
        mesh = make_data_mesh(data_shards)
    table = table.pad_rows_to(_round_up(table.words.shape[0], data_shards))
    core = init_state(table, base_vocab, vocab_cap, num_merges)

    chunk = max(1, min(chunk_size, num_merges))
    core_specs = state_partition_specs()
    if vocab_shards > 1:
        body = partial(
            _sharded_chunk_2d,
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            num_merges=num_merges,
            chunk_size=chunk,
            vocab_shards=vocab_shards,
        )
        state = core
        specs = core_specs
    else:
        from yabpe_tpu.train.incremental import (
            IncState,
            init_counts,
            pick_affected_cap,
        )

        rows_per_shard = table.words.shape[0] // data_shards
        body = partial(
            _sharded_chunk_incremental,
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            num_merges=num_merges,
            chunk_size=chunk,
            affected_cap=pick_affected_cap(rows_per_shard),
        )
        state = IncState(
            core=core,
            counts=init_counts(core.words, core.freqs, vocab_cap=vocab_cap),
        )
        specs = IncState(core=core_specs, counts=P())

    state = jax.device_put(
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

    start = 0
    while start < num_merges:
        state = fn(state, jnp.asarray(start, dtype=jnp.int32))
        start += chunk
        core_out = state.core if vocab_shards == 1 else state
        if bool(core_out.stopped):
            break
    core_out = state.core if vocab_shards == 1 else state
    return np.asarray(core_out.merges)


__all__ = ["run_sharded_merge_loop", "state_partition_specs"]
