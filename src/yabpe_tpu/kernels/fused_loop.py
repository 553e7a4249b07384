"""Fused Pallas merge-loop kernel: whole BPE training chunks in VMEM.

The XLA incremental step (yabpe_tpu.train.incremental) is correct but
launches ~40 small kernels per merge step; on TPU the per-launch latency
dominates the actual work by ~50x. This kernel runs ``chunk_size`` complete
merge steps inside ONE Pallas program with all state resident in VMEM:

    words [N, W] i32     counts [V, V] i32      token_bytes [V, L] i32
    freqs [1, N] i32     lex_rank [1, V] i32    token_len [1, V] i32
    merges [M, 4] i32    scalars [1, 8] i32 (SMEM)

Per step, entirely on the VPU/MXU:

1. **select**: global max of the count table; ties broken by the dense lex
   ranks (exact reference order, trainer.py:246 semantics).
2. **vocab update**: merged byte string built with an L x L shift-select,
   compared against all live tokens for the dedup branch
   (trainer.py:298-300), lex ranks bumped for the insertion.
3. **count delta without scatters**: merging (a, b) -> c only changes count
   entries in column a, column c, row b, row c, and the single (a, b) cell
   — every other pair is untouched by the row rewrite, so its old/new
   contributions cancel. Affected rows are processed in fixed-size batches:
   located by a lane-cumsum rank match, gathered AND scattered back with
   one-hot MXU matmuls (each output has exactly one nonzero contribution,
   so f32 is exact; frequencies ride as two 12/19-bit limbs). Each batch
   accumulates the four line-histograms (old minus new) with a column loop
   of one-hot compares. Line updates double-count exactly the four
   intersection cells {(b,a),(b,c),(c,a),(c,c)} — corrected by folding the
   duplicates out of the row vectors — and the lone off-line cell (a, b) is
   patched directly when a != b (when a == b it lies on the lines already).
4. **apply**: leftmost-non-overlapping match (run parity via log-step max
   scans) and butterfly compaction (log W stages of conditional left
   shifts; monotone shift distances make stage collisions impossible).

A ``while`` batch loop makes per-step work proportional to the number of
affected rows — the reference's incremental asymptotics at VPU/MXU width.
VMEM bounds the problem size (roughly V <= 1024, N*W <= 2M); the driver
falls back to the XLA incremental path beyond that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32
NEG = -(2**30)  # plain int: jnp scalars become captured consts in pallas
HIGHEST = jax.lax.Precision.HIGHEST

# scalar_state layout (SMEM [1, 8]):
_NEXT_ID = 0
_STOPPED = 1
_NUM_DONE = 2
_CHUNK_START = 3


def _shift_lanes(x: jax.Array, s: int, fill) -> jax.Array:
    n = x.shape[1]
    return jnp.concatenate(
        [jnp.full((x.shape[0], s), fill, x.dtype), x[:, : n - s]], axis=1
    )


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along lanes via log-step shifted adds.

    Mosaic has no cumsum lowering; this works for any [r, n] int array.
    """
    n = x.shape[1]
    s = 1
    while s < n:
        x = x + _shift_lanes(x, s, 0)
        s *= 2
    return x


def _row_cummax(x: jax.Array) -> jax.Array:
    """Inclusive cummax along axis 1 via log-step shifted maxes."""
    r, w = x.shape
    s = 1
    while s < w:
        x = jnp.maximum(x, _shift_lanes(x, s, NEG))
        s *= 2
    return x


def _leftmost_nonoverlap(match: jax.Array) -> jax.Array:
    """Leftmost non-overlapping True positions per row ([r, w] bool)."""
    r, w = match.shape
    iota = jax.lax.broadcasted_iota(I32, (r, w), 1)
    last_false = _row_cummax(jnp.where(match, -1, iota))
    prev_false = jnp.concatenate(
        [jnp.full((r, 1), -1, I32), last_false[:, : w - 1]], axis=1
    )
    run_offset = iota - (prev_false + 1)
    return match & (run_offset % 2 == 0)


def _butterfly_compact(vals: jax.Array, keep: jax.Array, pad: int) -> jax.Array:
    """Stable left-compaction of kept entries via log W butterfly stages.

    Shift distances (dropped-before counts) rise by at most the index gap
    between survivors, which makes per-stage destinations collision-free.
    """
    r, w = vals.shape
    vals = jnp.where(keep, vals, pad)
    dropped = _b2i(jnp.logical_not(keep))
    rem = _cumsum_lanes(dropped) - dropped  # dropped strictly before j
    rem = jnp.where(keep, rem, 0)
    s = 1
    while s < w:
        in_vals = jnp.concatenate(
            [vals[:, s:], jnp.full((r, s), pad, vals.dtype)], axis=1
        )
        in_rem = jnp.concatenate([rem[:, s:], jnp.zeros((r, s), I32)], axis=1)
        incoming = (in_rem & s) != 0
        leaving = (rem & s) != 0
        vals = jnp.where(incoming, in_vals, jnp.where(leaving, pad, vals))
        rem = jnp.where(incoming, in_rem - s, jnp.where(leaving, 0, rem))
        s *= 2
    return vals


def _b2i(x: jax.Array) -> jax.Array:
    """bool -> i32 via select (Mosaic rejects some i1->i32 vreg casts)."""
    return jnp.where(x, jnp.ones_like(x, I32), jnp.zeros_like(x, I32))


def _argmax_lanes(x: jax.Array) -> jax.Array:
    """First-argmax over lanes of [1, n] -> scalar i32.

    Mosaic's native argmax lowering is float-only; max + first-match-index
    keeps everything in int32.
    """
    n = x.shape[1]
    m = jnp.max(x)
    iota = jax.lax.broadcasted_iota(I32, (1, n), 1)
    return jnp.min(jnp.where(x == m, iota, n)).astype(I32)


def _extract(vec_1v: jax.Array, i: jax.Array, iota_v: jax.Array) -> jax.Array:
    """vec[0, i] via masked sum (avoids dynamic lane extraction)."""
    return jnp.sum(jnp.where(iota_v == i, vec_1v, 0)).astype(vec_1v.dtype)


def _fdot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=F32,
        precision=HIGHEST,
    )


def _merge_loop_kernel(
    words_ref,        # [N, W] i32 VMEM   (alias out 0)
    counts_ref,       # [V, V] i32 VMEM   (alias out 1)
    token_bytes_ref,  # [V, L] i32 VMEM   (alias out 2)
    token_len_ref,    # [1, V] i32 VMEM   (alias out 3)
    lex_rank_ref,     # [1, V] i32 VMEM   (alias out 4)
    merges_ref,       # [M, 4] i32 VMEM   (alias out 5)
    scalars_ref,      # [1, 8] i32 SMEM   (alias out 6)
    freqs_ref,        # [1, N] i32 VMEM   (read-only)
    words_out,
    counts_out,
    token_bytes_out,
    token_len_out,
    lex_rank_out,
    merges_out,
    scalars_out,
    *,
    vocab_cap: int,
    num_merges: int,
    chunk_size: int,
    min_frequency: int,
    batch_rows: int,
):
    # Copy inputs to (aliased) outputs once, then operate purely on the
    # output refs — correct under both real aliasing and interpret mode.
    words_out[...] = words_ref[...]
    counts_out[...] = counts_ref[...]
    token_bytes_out[...] = token_bytes_ref[...]
    token_len_out[...] = token_len_ref[...]
    lex_rank_out[...] = lex_rank_ref[...]
    merges_out[...] = merges_ref[...]
    scalars_out[0, 0] = scalars_ref[0, 0]
    scalars_out[0, 1] = scalars_ref[0, 1]
    scalars_out[0, 2] = scalars_ref[0, 2]
    scalars_out[0, 3] = scalars_ref[0, 3]
    words_ref = words_out
    counts_ref = counts_out
    token_bytes_ref = token_bytes_out
    token_len_ref = token_len_out
    lex_rank_ref = lex_rank_out
    merges_ref = merges_out
    scalars_ref = scalars_out

    V = vocab_cap
    N, W = words_ref.shape
    L = token_bytes_ref.shape[1]
    A = batch_rows

    iota_v = jax.lax.broadcasted_iota(I32, (1, V), 1)
    iota_l = jax.lax.broadcasted_iota(I32, (1, L), 1)

    # Frequency limbs as f32 (exact: one nonzero per gather output).
    freqs_i = freqs_ref[0, :].reshape(1, N)
    f_lo = (freqs_i & 0xFFF).astype(F32)     # [1, N]
    f_hi = (freqs_i >> 12).astype(F32)

    def step_body(i, _):
        step = scalars_ref[0, _CHUNK_START] + i
        in_range = step < num_merges
        rec_idx = jnp.minimum(step, num_merges - 1)
        stopped = scalars_ref[0, _STOPPED] != 0
        next_id = scalars_ref[0, _NEXT_ID]

        # ---------------------------------------------------------- select
        counts = counts_ref[:]
        lex = lex_rank_ref[0, :].reshape(1, V)
        best_count = jnp.max(counts)
        cand = counts == best_count
        row_has = (jnp.max(_b2i(cand), axis=1) > 0).reshape(1, V)
        a = _argmax_lanes(jnp.where(row_has, lex, -1))
        cand_a = counts_ref[pl.ds(a, 1), :] == best_count  # [1, V] bool
        b = _argmax_lanes(jnp.where(cand_a, lex, -1))

        stop_now = (best_count < max(min_frequency, 1)) | (best_count <= 0)
        do = in_range & jnp.logical_not(stopped) & jnp.logical_not(stop_now)
        new_stopped = stopped | (in_range & stop_now)

        # ---------------------------------------------------- vocab update
        tb_a = token_bytes_ref[pl.ds(a, 1), :]  # [1, L]
        tb_b = token_bytes_ref[pl.ds(b, 1), :]
        la = _extract(token_len_ref[0, :].reshape(1, V), a, iota_v)
        lb = _extract(token_len_ref[0, :].reshape(1, V), b, iota_v)
        # merged[i] = tb_a[i] if i < la else tb_b[i - la] else -1
        shift_sel = iota_l.reshape(L, 1) == (iota_l - la)  # [L src, L dst]
        from_b = jnp.sum(
            jnp.where(shift_sel, tb_b.reshape(L, 1), 0), axis=0
        ).reshape(1, L)
        merged = jnp.where(
            iota_l < la, tb_a, jnp.where(iota_l < la + lb, from_b, -1)
        ).astype(I32)

        tb = token_bytes_ref[:]
        diff = tb != jnp.broadcast_to(merged, (V, L))
        any_diff = jnp.max(_b2i(diff), axis=1) > 0  # [V]
        iota_vl = jax.lax.broadcasted_iota(I32, (V, L), 1)
        first = jnp.min(
            jnp.where(diff, iota_vl, L), axis=1
        ).astype(I32).reshape(V, 1)
        sel = iota_vl == first
        row_val = jnp.sum(jnp.where(sel, tb, 0), axis=1)  # [V]
        q_val = jnp.sum(
            jnp.where(sel, jnp.broadcast_to(merged, (V, L)), 0), axis=1
        )
        less = (any_diff & (row_val < q_val)).reshape(1, V)
        equal = jnp.logical_not(any_diff).reshape(1, V)
        active = iota_v < next_id
        eq_active = equal & active
        exists = jnp.max(_b2i(eq_active)) > 0
        existing_id = _argmax_lanes(_b2i(eq_active))
        c = jnp.where(exists, existing_id, next_id).astype(I32)

        grow = do & jnp.logical_not(exists)
        insert_rank = jnp.sum(
            jnp.where(less & active, 1, 0)
        ).astype(I32)
        bumped = jnp.where(active & (lex >= insert_rank), lex + 1, lex)
        with_new = jnp.where(iota_v == next_id, insert_rank, bumped)
        lex_rank_ref[0, :] = jnp.where(grow, with_new, lex)[0, :]

        @pl.when(grow)
        def _():
            token_bytes_ref[pl.ds(next_id, 1), :] = merged
            tl = token_len_ref[0, :].reshape(1, V)
            token_len_ref[0, :] = jnp.where(
                iota_v == next_id, la + lb, tl
            )[0, :]

        scalars_ref[0, _NEXT_ID] = next_id + grow.astype(I32)
        scalars_ref[0, _STOPPED] = new_stopped.astype(I32)
        scalars_ref[0, _NUM_DONE] = scalars_ref[0, _NUM_DONE] + do.astype(I32)

        @pl.when(do)
        def _():
            rec = jnp.concatenate(
                [
                    a.reshape(1, 1),
                    b.reshape(1, 1),
                    c.reshape(1, 1),
                    jnp.zeros((1, 1), I32),
                ],
                axis=1,
            )
            merges_ref[pl.ds(rec_idx, 1), :] = rec

        # ------------------------------------------- affected-row batches
        words = words_ref[:]
        wl = words[:, : W - 1]
        wr = words[:, 1:]
        match_rows = jnp.max(_b2i((wl == a) & (wr == b) & (wl >= 0)), axis=1) > 0
        row_aff = (match_rows & do).reshape(1, N)
        csum = _cumsum_lanes(_b2i(row_aff))  # [1, N] affected ranks
        n_aff = jnp.max(csum)

        def batch_body(carry):
            batch_idx, total = carry
            base_rank = batch_idx * A

            ranks = (
                base_rank + 1 + jax.lax.broadcasted_iota(I32, (A, 1), 0)
            )
            onehot = _b2i((csum == ranks) & row_aff).astype(F32)  # [A, N]

            words_cur = words_ref[:]
            rows = _fdot(onehot, words_cur.astype(F32)).astype(I32)  # [A, W]
            flo = _fdot(onehot, f_lo.reshape(N, 1)).astype(I32)      # [A, 1]
            fhi = _fdot(onehot, f_hi.reshape(N, 1)).astype(I32)
            fcol = fhi * 4096 + flo                                   # [A, 1]

            # Merge within the batch.
            rl = rows[:, : W - 1]
            rr = rows[:, 1:]
            m = (rl == a) & (rr == b) & (rl >= 0)
            applied = _b2i(_leftmost_nonoverlap(m))  # i32: Mosaic dislikes bool concats
            zcol = jnp.zeros((A, 1), I32)
            applied_at = jnp.concatenate([applied, zcol], axis=1) != 0
            removed_at = jnp.concatenate([zcol, applied], axis=1) != 0
            new_vals = jnp.where(applied_at, c, rows)
            keep = jnp.logical_not(removed_at) & (rows >= 0)
            new_rows = _butterfly_compact(new_vals, keep, -1)

            # Line-histogram deltas in one signed pass: concat old rows
            # (weight -f) with new rows (weight +f) and reduce 3D one-hot
            # masks over (rows, positions) at full VPU width.
            rows_cat = jnp.concatenate([rows, new_rows], axis=0)  # [2A, W]
            f_cat = jnp.concatenate([-fcol, fcol], axis=0)        # [2A, 1]
            lc = rows_cat[:, : W - 1]
            rc_ = rows_cat[:, 1:]
            vc = lc >= 0
            fp = jnp.broadcast_to(f_cat, (2 * A, W - 1))
            # Reshape only int vectors to 3D (Mosaic rejects i1 reshapes)
            # and rebuild the masks in 3D.
            l3 = lc[:, :, None]
            r3 = rc_[:, :, None]
            v3 = l3 >= 0
            f3 = fp[:, :, None]
            iv3 = iota_v.reshape(1, 1, V)
            oh_l = (l3 == iv3) & v3  # [2A, W-1, V]
            oh_r = (r3 == iv3) & v3
            d_col_a = jnp.sum(
                jnp.where(oh_l & (r3 == a), f3, 0), axis=(0, 1)
            ).reshape(1, V)
            d_col_c = jnp.sum(
                jnp.where(oh_l & (r3 == c), f3, 0), axis=(0, 1)
            ).reshape(1, V)
            d_row_b = jnp.sum(
                jnp.where(oh_r & (l3 == b), f3, 0), axis=(0, 1)
            ).reshape(1, V)
            d_row_c = jnp.sum(
                jnp.where(oh_r & (l3 == c), f3, 0), axis=(0, 1)
            ).reshape(1, V)
            d_ab = jnp.sum(jnp.where((lc == a) & (rc_ == b) & vc, fp, 0))

            # Column updates over the whole table.
            col_term = jnp.where(
                iota_v == a, d_col_a.reshape(V, 1), 0
            ) + jnp.where(iota_v == c, d_col_c.reshape(V, 1), 0)
            counts_ref[:] = counts_ref[:] + col_term

            # Row updates, with intersection duplicates folded out:
            # cells (b,a),(b,c) were already applied via the columns.
            corr_b = jnp.where(
                iota_v == a, _extract(d_col_a, b, iota_v), 0
            ) + jnp.where(iota_v == c, _extract(d_col_c, b, iota_v), 0)
            corr_c = jnp.where(
                iota_v == a, _extract(d_col_a, c, iota_v), 0
            ) + jnp.where(iota_v == c, _extract(d_col_c, c, iota_v), 0)
            rb_cur = counts_ref[pl.ds(b, 1), :]
            counts_ref[pl.ds(b, 1), :] = rb_cur + d_row_b - corr_b
            rc_cur = counts_ref[pl.ds(c, 1), :]
            counts_ref[pl.ds(c, 1), :] = rc_cur + d_row_c - corr_c

            # Off-line cell (a, b) unless a == b (then already on-line).
            ab_vec = jnp.where(
                (iota_v == b) & (a != b), d_ab, 0
            )
            ra_cur = counts_ref[pl.ds(a, 1), :]
            counts_ref[pl.ds(a, 1), :] = ra_cur + ab_vec

            # Scatter merged rows back: words += onehot^T @ (new - old).
            delta_rows = (new_rows - rows).astype(F32)  # [A, W]
            scatter = _fdot(
                onehot.reshape(A, N).T, delta_rows
            ).astype(I32)  # [N, W]
            words_ref[:] = words_cur + scatter

            return (batch_idx + 1, total)

        def batch_cond(carry):
            batch_idx, total = carry
            return batch_idx * A < total

        jax.lax.while_loop(batch_cond, batch_body, (jnp.int32(0), n_aff))
        return 0

    jax.lax.fori_loop(0, chunk_size, step_body, 0)


@partial(
    jax.jit,
    static_argnames=(
        "vocab_cap",
        "num_merges",
        "chunk_size",
        "min_frequency",
        "batch_rows",
        "interpret",
    ),
)
def fused_merge_chunk(
    words: jax.Array,
    counts: jax.Array,
    token_bytes: jax.Array,
    token_len: jax.Array,
    lex_rank: jax.Array,
    merges: jax.Array,
    scalars: jax.Array,
    freqs: jax.Array,
    *,
    vocab_cap: int,
    num_merges: int,
    chunk_size: int,
    min_frequency: int,
    batch_rows: int = 64,
    interpret: bool = False,
):
    """Run ``chunk_size`` fused merge steps; returns the updated state tuple

    (words, counts, token_bytes, token_len, lex_rank, merges, scalars).

    Wrapped in jax.jit so the Mosaic program goes through the persistent
    compilation cache (bare pallas_call dispatch recompiles per process).
    """
    kernel = partial(
        _merge_loop_kernel,
        vocab_cap=vocab_cap,
        num_merges=num_merges,
        chunk_size=chunk_size,
        min_frequency=min_frequency,
        batch_rows=batch_rows,
    )
    out_shape = [
        jax.ShapeDtypeStruct(words.shape, words.dtype),
        jax.ShapeDtypeStruct(counts.shape, counts.dtype),
        jax.ShapeDtypeStruct(token_bytes.shape, token_bytes.dtype),
        jax.ShapeDtypeStruct(token_len.shape, token_len.dtype),
        jax.ShapeDtypeStruct(lex_rank.shape, lex_rank.dtype),
        jax.ShapeDtypeStruct(merges.shape, merges.dtype),
        jax.ShapeDtypeStruct(scalars.shape, scalars.dtype),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vmem, vmem, vmem, vmem, vmem, vmem, smem, vmem],
        out_specs=[vmem, vmem, vmem, vmem, vmem, vmem, smem],
        input_output_aliases={i: i for i in range(7)},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Default scoped VMEM is 16 MB; the step temporaries (one-hot
            # gather/scatter operands, count-table masks) need more at
            # realistic N/V. v5e VMEM is 128 MB physical.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(words, counts, token_bytes, token_len, lex_rank, merges, scalars, freqs)


__all__ = ["fused_merge_chunk"]
