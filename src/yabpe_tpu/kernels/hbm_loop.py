"""HBM-tiled fused BPE merge-loop kernel: 32k-vocab training on one chip.

The all-VMEM fused kernel (yabpe_tpu.kernels.fused_loop) is capped at
roughly V <= 1024 / N*W <= 2M. This kernel lifts both caps: the [V, V]
pair-count table lives in HBM and is touched per step only through
row-granular DMA windows, while the word table stays VMEM-resident in a
16-bit interleaved layout. It is the TPU-native analogue of the
reference's incremental merge loop with inverted-index affected-word
maintenance (/root/reference/src/yet_another_bpe/trainer.py:216-302), and
is bit-identical to it (same (count, lexicographically-greatest-pair)
selection, leftmost non-overlapping application, merged-bytes dedup,
min-frequency stop).

State (all pallas inputs aliased to outputs; persists across dispatches):

    words    [NR, (W+2)*128] i16 VMEM   interleaved word table: word
             j = (packed row j//128, lane column j%128); symbol w of the
             word sits at lane w*128 + j%128; lane blocks W and W+1 hold
             the word frequency as unsigned 16-bit limbs (lo, hi).
             Adjacent symbols are 128 lanes apart, so every per-position
             operation is a STATIC 128-lane shift, and gathering a word's
             packed row is a sublane-dynamic DMA — the two access patterns
             Mosaic supports natively (dynamic *lane* indexing is not).
    row_max  [1, V]  i32 VMEM   upper bound on each table row's max count
    token_bytes [L, V] i32 (transposed: tokens are lanes),
    token_len/lex_rank [1, V] i32, merges [M, 128] i32 HBM
    scalars  [1, 8]  i32 SMEM   next_id, stopped, num_done
    counts   [V, V]  i32 HBM    the dense pair table (DMA windows only)

Per merge step:

1. **select**: global max of `row_max` picks the lex-greatest candidate
   row; a lazy verify (row DMA + exact max) confirms or tightens the
   bound and retries — bigvocab's lazy selection moved on-chip, O(V)
   VMEM work + one 8-row HBM window per verify instead of an O(V^2) scan.
2. **vocab update**: merged byte string, dedup against live tokens,
   lex-rank insertion (same construction as the VMEM fused kernel).
3. **affected words**: one vectorized match pass over the word table
   yields per-word flags; flagged words are then processed one 8-row
   WINDOW at a time (all of a window's flagged words together — vector
   ops on [8, WL] occupy the same registers as one row): the leftmost-
   non-overlapping merge applies in the strided view, and every adjacent
   pair inside the changed window [first_merge-1, last_merge+1] is
   emitted as a (left, right, +/-freq) cell — old pairs negative, new
   pairs positive; excluded suffix pairs cancel as a shift bijection
   (the reference's bounded-update-window optimization, fuzz-verified
   over 300k random words).
4. **count update**: merging (a, b) -> c only changes table column a,
   column c, row b, row c and the (a, b) cell, so staged cells classify
   into those five buckets (off-line cells provably cancel and drop).
   Rows apply as at most THREE [8, V]-window RMWs per step with exact
   row-max refresh; column deltas accumulate in an f32 pending-column
   buffer (one slot per column, per-slot magnitude guard) that selection
   reads through, evicted block-grouped via one MXU matmul per dirty
   128-column block and drained before every dispatch returns. Row-max
   bounds carry each row's pending positive mass, so they stay true
   upper bounds between evictions.

Capacity limits: vocab_cap <= 32768 (i16 symbol ids) and word width
<= 64 bytes (changed-cell buffers); the driver falls back to the XLA
bigvocab engine beyond either. Pair counts are exact up to 2^31: the
pending-column accumulator stores each slot as TWO f32 limbs
(value = hi * 4096 + lo), each kept under 2^24 by the flush's per-slot
mag tracking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I16 = jnp.int16
I32 = jnp.int32
F32 = jnp.float32
NEG = -(2**30)
BIG = 2**30

# scalars layout (SMEM [1, 8]); slots 3..6 are per-step selection temps
# (sel_a, sel_b, sel_count, sel_stop) written by whichever of the
# select/replay branches ran — they carry no cross-dispatch state.
_NEXT_ID = 0
_STOPPED = 1
_NUM_DONE = 2
_SEL_A = 3
_SEL_B = 4
_SEL_CNT = 5
_SEL_STOP = 6
_N_AFF = 7  # per-step scratch: affected-word count (streaming scan)


def _shift_blocks(x: jax.Array, s_blocks: int, fill) -> jax.Array:
    """Shift lanes right by ``s_blocks * 128`` (static lane concat).

    In the interleaved layout a 128-lane shift moves every word's symbols
    one position later, so this is the per-position shift primitive.
    """
    r, n = x.shape
    s = s_blocks * 128
    return jnp.concatenate(
        [jnp.full((r, s), fill, x.dtype), x[:, : n - s]], axis=1
    )


def _cumsum_blocks(x: jax.Array, nblocks: int) -> jax.Array:
    """Inclusive cumsum across positions (stride-128 lanes), log-step."""
    s = 1
    while s < nblocks:
        x = x + _shift_blocks(x, s, 0)
        s *= 2
    return x


def _cummax_blocks(x: jax.Array, nblocks: int) -> jax.Array:
    s = 1
    while s < nblocks:
        x = jnp.maximum(x, _shift_blocks(x, s, NEG))
        s *= 2
    return x


def _b2i(x: jax.Array) -> jax.Array:
    return jnp.where(x, jnp.ones_like(x, I32), jnp.zeros_like(x, I32))


def _leftmost_nonoverlap_blocks(
    match: jax.Array, nblocks: int
) -> jax.Array:
    """Leftmost non-overlapping True positions along the stride-128 axis.

    ``match`` is [r, nblocks*128] bool with positions 128 lanes apart
    (each of the 128 interleaved words is independent — runs never span
    lanes of different ``% 128`` classes because shifts are whole blocks).
    """
    r, n = match.shape
    pos = jax.lax.broadcasted_iota(I32, (r, n), 1) // 128
    # -1 (not a large negative) so a run starting at position 0 keeps
    # run_offset == pos: prev_false + 1 == 0 there.
    last_false = _cummax_blocks(jnp.where(match, -1, pos), nblocks)
    prev_false = _shift_blocks(last_false, 1, -1)
    run_offset = pos - (prev_false + 1)
    return match & (run_offset % 2 == 0)


def _butterfly_compact_blocks(
    vals: jax.Array, keep: jax.Array, nblocks: int, pad: int
) -> jax.Array:
    """Stable left-compaction along the stride-128 position axis."""
    r, n = vals.shape
    vals = jnp.where(keep, vals, pad)
    dropped = _b2i(jnp.logical_not(keep))
    rem = _cumsum_blocks(dropped, nblocks) - dropped
    rem = jnp.where(keep, rem, 0)
    s = 1
    while s < nblocks:
        sh = s * 128
        in_vals = jnp.concatenate(
            [vals[:, sh:], jnp.full((r, sh), pad, vals.dtype)], axis=1
        )
        in_rem = jnp.concatenate(
            [rem[:, sh:], jnp.zeros((r, sh), I32)], axis=1
        )
        incoming = (in_rem & s) != 0
        leaving = (rem & s) != 0
        vals = jnp.where(incoming, in_vals, jnp.where(leaving, pad, vals))
        rem = jnp.where(incoming, in_rem - s, jnp.where(leaving, 0, rem))
        s *= 2
    return vals


def _compact_lanes_multi(
    arrs: list[jax.Array], pads: list[int], keep: jax.Array
) -> list[jax.Array]:
    """Stable left-compaction of ALIGNED [1, n] arrays sharing one rank
    computation (one butterfly routing pass moves every array together)."""
    r, n = arrs[0].shape
    arrs = [jnp.where(keep, v, p) for v, p in zip(arrs, pads)]
    dropped = _b2i(jnp.logical_not(keep))
    # inclusive lane cumsum, log-step
    rem = dropped
    s = 1
    while s < n:
        rem = rem + jnp.concatenate(
            [jnp.zeros((r, s), I32), rem[:, : n - s]], axis=1
        )
        s *= 2
    rem = rem - dropped
    rem = jnp.where(keep, rem, 0)
    s = 1
    while s < n:
        in_arrs = [
            jnp.concatenate(
                [v[:, s:], jnp.full((r, s), p, v.dtype)], axis=1
            )
            for v, p in zip(arrs, pads)
        ]
        in_rem = jnp.concatenate([rem[:, s:], jnp.zeros((r, s), I32)], axis=1)
        incoming = (in_rem & s) != 0
        leaving = (rem & s) != 0
        arrs = [
            jnp.where(incoming, iv, jnp.where(leaving, p, v))
            for v, iv, p in zip(arrs, in_arrs, pads)
        ]
        rem = jnp.where(incoming, in_rem - s, jnp.where(leaving, 0, rem))
        s *= 2
    return arrs


def _argmax_lanes(x: jax.Array) -> jax.Array:
    """First-argmax over lanes of [1, n] -> scalar i32 (int-only)."""
    n = x.shape[1]
    m = jnp.max(x)
    iota = jax.lax.broadcasted_iota(I32, (1, n), 1)
    return jnp.min(jnp.where(x == m, iota, n)).astype(I32)


def _extract_lane(vec_1v: jax.Array, i: jax.Array) -> jax.Array:
    """vec[0, i] via masked sum (no dynamic lane extraction on TPU)."""
    n = vec_1v.shape[1]
    iota = jax.lax.broadcasted_iota(I32, (1, n), 1)
    return jnp.sum(jnp.where(iota == i, vec_1v, 0)).astype(vec_1v.dtype)


def _hbm_loop_kernel(
    # aliased state (inputs 0..9 -> outputs 0..9)
    words_in,        # [NR, WL] i16       narrow width bucket (W1)
    words2_in,       # [NR2, WL2] i16     wide bucket (W2; dummy if absent)
    row_max_in,      # [1, V] i32 VMEM
    token_bytes_in,  # [L, V] i32 VMEM (transposed)
    token_len_in,    # [1, V] i32 VMEM
    lex_rank_in,     # [1, V] i32 VMEM
    merges_in,       # [M, 4] i32 VMEM
    scalars_in,      # [1, 8] i32 SMEM
    counts_in,       # [V, V] i32 ANY (HBM)
    # plain input
    cfg_ref,         # [1, 4] i32 SMEM: [chunk_start, ...]
    # outputs (aliases, same order as the aliased inputs)
    words_ref,
    words2_ref,
    row_max_ref,
    token_bytes_ref,
    token_len_ref,
    lex_rank_ref,
    merges_ref,
    scalars_ref,
    counts_ref,
    # scratch
    flags_ref,       # [NR, 128] i32 VMEM
    rowany_ref,      # [NR, 1] i32 VMEM   per-packed-row any-flag summary
    flags2_ref,      # [NR2, 128] i32 VMEM (bucket 2)
    rowany2_ref,     # [NR2, 1] i32 VMEM
    gwin_ref,        # [8, WL] i16 VMEM   gather window (bucket 1)
    gwin2_ref,       # [8, WL2] i16 VMEM  gather window (bucket 2)
    rowwin_ref,      # [8, V] i32 VMEM    count-row window
    rowwin2_ref,     # [8, V] i32 VMEM    second row window (RMW overlap)
    stage_l_ref,     # [A, 128] i32 VMEM  staged cell left syms (-1 empty)
    stage_r_ref,     # [A, 128] i32 VMEM
    stage_w_ref,     # [A, 128] i32 VMEM
    addvecs_ref,     # [4, V] i32 VMEM    line-bucket delta vectors
    mring_ref,       # [chunk_size, 128] i32 VMEM  merge-record ring
    colacc_ref,      # [2F, V] f32 VMEM   pending column deltas, 2 limbs:
                     #   rows [0,F) = low 12 bits, rows [F,2F) = high part
                     #   (value = hi*4096 + lo; exact for counts to 2^31)
    colids_v_ref,    # [F, 1] i32 VMEM    slot -> column id (-1 empty)
    colmeta_ref,     # [3F+6] i32 SMEM    [0,F) slot ids; [F,2F) mags;
                     #   [2F,3F) per-slot max delta row; 3F nslots;
                     #   3F+1 maxmag; 3F+2 n_cells / 3F+3 d_ab (per
                     #   flush); 3F+4 slab-presence bitmask; 3F+5 d_ab
                     #   step accumulator
    colblk_ref,      # [V, 128] i32 VMEM  eviction block window
    pendrow_ref,     # [1, V] i32 VMEM    verify read-through overlay
    pendpos_ref,     # [1, V] i32 VMEM    per-row positive pending bound
    pendany_ref,     # [1, V] i32 VMEM    rows with ANY pending delta
    pendtmp_ref,     # [2F, 1] f32 VMEM   overlay per-slot limb sums
    scan_a_ref,      # [SG, WL] i16 VMEM  streaming-scan buffer A
    scan_b_ref,      # [SG, WL] i16 VMEM  streaming-scan buffer B
    scan2_a_ref,     # [SG, WL2] i16 VMEM streaming-scan buffer A (b2)
    scan2_b_ref,     # [SG, WL2] i16 VMEM streaming-scan buffer B (b2)
    sems,            # DMA semaphores (6,)
    *,
    vocab_cap: int,
    word_width: int,
    word_width2: int,
    byte_width: int,
    num_merges: int,
    chunk_size: int,
    min_frequency: int,
    copy_in: bool,
    words_in_hbm: bool,
    wide_hist: bool,
    ablate: int,
):
    V = vocab_cap
    W = word_width
    L = byte_width
    NR = words_in.shape[0]
    WL = (W + 2) * 128
    # Width-bucketed word table (r5): bucket 1 holds words of <= W
    # symbols packed at width W, bucket 2 (optional) the rest at W2 > W.
    # Most words are short, so scanning/streaming/visiting each bucket
    # at its own width cuts the dominant per-step stream and visit cost
    # roughly in half at 1 GB scale (PERFORMANCE.md "width-bucketed").
    HAS2 = word_width2 > 0
    W2 = max(word_width2, 2)
    NR2 = words2_in.shape[0]
    WL2 = (W2 + 2) * 128
    A = stage_l_ref.shape[0]
    F = colacc_ref.shape[0] // 2
    NB = W - 1  # adjacent-pair position blocks
    # Vocabularies past i16 range (GPT-2's 50,257) store symbol ids as
    # u16 BIT PATTERNS in the i16 word table: reads mask to the low 16
    # bits, the empty sentinel -1 reads as 65535, and write-back's
    # i32->i16 convert truncates bits (65535 -> -1) so storage stays
    # uniform. Freq limb blocks are unaffected (they already mask/shift).
    WIDE = V > 32768
    EMPTY = 65535 if WIDE else -1

    def _sym32(x):
        v = x.astype(I32)
        return (v & 0xFFFF) if WIDE else v

    # VMEM-windowed outputs do not inherit the aliased input's contents
    # (input and output windows are separate on-chip buffers); copy them
    # in once, then operate purely on the output refs — the same pattern
    # as the VMEM fused kernel. The big buffers copy by DMA (a value copy
    # holds the whole array in vector registers and spills). The
    # ANY-space counts/merges refs have no windows: with real aliasing
    # both refs ARE the same HBM buffer, so only interpret mode (no
    # aliasing) must materialize those copies.
    if not words_in_hbm:
        cpw = pltpu.make_async_copy(words_in, words_ref, sems.at[0])
        cpw.start()
        # the dummy bucket-2 buffer copies too (an output must not
        # return uninitialized in interpret mode, where nothing aliases)
        cpw2 = pltpu.make_async_copy(words2_in, words2_ref, sems.at[5])
        cpw2.start()
    cpt = pltpu.make_async_copy(token_bytes_in, token_bytes_ref, sems.at[1])
    cpt.start()
    row_max_ref[...] = row_max_in[...]
    token_len_ref[...] = token_len_in[...]
    lex_rank_ref[...] = lex_rank_in[...]
    for k in range(4):
        scalars_ref[0, k] = scalars_in[0, k]
    if not words_in_hbm:
        cpw.wait()
        cpw2.wait()
    cpt.wait()
    if copy_in:
        cpk = pltpu.make_async_copy(counts_in, counts_ref, sems.at[0])
        cpk.start()
        cpk.wait()
        cpm = pltpu.make_async_copy(merges_in, merges_ref, sems.at[0])
        cpm.start()
        cpm.wait()
        if words_in_hbm:
            # ANY-space words only need materializing in interpret mode
            # (real aliasing makes input and output the same HBM buffer).
            cpw = pltpu.make_async_copy(words_in, words_ref, sems.at[0])
            cpw.start()
            cpw.wait()
            cpw2 = pltpu.make_async_copy(words2_in, words2_ref, sems.at[0])
            cpw2.start()
            cpw2.wait()

    iota_v = jax.lax.broadcasted_iota(I32, (1, V), 1)
    iota_l = jax.lax.broadcasted_iota(I32, (1, L), 1)
    chunk_start = cfg_ref[0, 0]
    # Steps below this global index REPLAY the recorded (a, b) from the
    # merge buffer instead of selecting: checkpoint resume rebuilds the
    # full device state deterministically through the exact same
    # apply/count machinery, skipping only the argmax work.
    replay_until = cfg_ref[0, 1]

    def row_window_read(rid, buf_ref, sem):
        # HBM memrefs are (8, 128)-tiled: slices must be 8-row aligned,
        # so a single row always moves as its aligned 8-row window.
        base = (rid // 8) * 8
        cp = pltpu.make_async_copy(
            counts_ref.at[pl.ds(base, 8), :], buf_ref, sem
        )
        cp.start()
        cp.wait()
        return base

    # Merge records accumulate in a VMEM ring and flush to the HBM merges
    # buffer once per chunk: an [M, 4] VMEM window would pad its lane
    # dimension 4 -> 128 (16 MB per window at 32k merges), and DMA slices
    # must be 128-aligned in the minor dimension — hence 128-wide rows.
    mring_ref[...] = jnp.full((chunk_size, 128), -1, I32)

    @pl.when(replay_until > chunk_start)
    def _load_replay_records():
        cpr = pltpu.make_async_copy(
            merges_ref.at[pl.ds(chunk_start, chunk_size), :],
            mring_ref,
            sems.at[3],
        )
        cpr.start()
        cpr.wait()

    # Pending-column state starts empty and is drained before the
    # dispatch returns, so the HBM table is always exact at dispatch
    # boundaries.
    for _sb in range(V // _slab_size(V)):
        _lo = _sb * _slab_size(V)
        colacc_ref[:, pl.ds(_lo, _slab_size(V))] = jnp.zeros(
            (2 * F, _slab_size(V)), F32
        )
    colids_v_ref[...] = jnp.full((F, 1), -1, I32)

    def _meta_init(t, _):
        colmeta_ref[t] = -1
        colmeta_ref[F + t] = 0
        colmeta_ref[2 * F + t] = -1
        return 0

    jax.lax.fori_loop(0, F, _meta_init, 0)
    for _mt in range(6):
        colmeta_ref[3 * F + _mt] = 0
    pendpos_ref[...] = jnp.zeros((1, V), I32)
    pendany_ref[...] = jnp.zeros((1, V), I32)

    def step_body(step_i, _):
        step = chunk_start + step_i
        in_range = step < num_merges
        stopped = scalars_ref[0, _STOPPED] != 0

        @pl.when(in_range & jnp.logical_not(stopped))
        def _active_step():
            next_id = scalars_ref[0, _NEXT_ID]
            lex = lex_rank_ref[...]
            is_replay = step < replay_until

            def overlay_pend(a):
                # read-through: overlay row ``a``'s pending column deltas
                pendrow_ref[...] = jnp.zeros((1, V), I32)

                has_pend = _extract_lane(pendany_ref[...], a) > 0

                @pl.when((colmeta_ref[3 * F] > 0) & has_pend)
                def _():
                    sl = _slab_size(V)
                    # Only the slab holding lane ``a`` can contribute to
                    # the limb sum (io == a is false on every other
                    # slab), so read ONE [2F, sl] slab instead of all V
                    # lanes — the full sweep cost ~33 MB of VMEM reads
                    # per select verify / replay step.
                    for sb in range(V // sl):
                        lo = sb * sl

                        @pl.when(a // sl == sb)
                        def _(lo=lo):
                            io = jax.lax.broadcasted_iota(
                                I32, (1, sl), 1
                            ) + lo
                            pendtmp_ref[...] = jnp.sum(
                                jnp.where(
                                    io == a,
                                    colacc_ref[:, pl.ds(lo, sl)],
                                    0.0,
                                ),
                                axis=1,
                                keepdims=True,
                            )  # exact: a single lane is picked
                    # recombine the limbs per slot in i32 (exact: each
                    # limb sum is an integer < 2^24 in f32, and the true
                    # value fits i32)
                    pend = pendtmp_ref[...]
                    pend_i = (
                        pend[0:F, :].astype(I32)
                        + pend[F : 2 * F, :].astype(I32) * 4096
                    )
                    # scatter back only slabs that hold a pending column
                    # id (the bitmask is maintained by col_accumulate);
                    # pendrow is pre-zeroed so skipped slabs are exact
                    smask = colmeta_ref[3 * F + 4]
                    for sb in range(V // sl):
                        lo = sb * sl

                        @pl.when(((smask >> sb) & 1) != 0)
                        def _(lo=lo):
                            io = jax.lax.broadcasted_iota(
                                I32, (1, sl), 1
                            ) + lo
                            pendrow_ref[:, pl.ds(lo, sl)] = jnp.sum(
                                jnp.where(
                                    colids_v_ref[...] == io, pend_i, 0
                                ),
                                axis=0,
                                keepdims=True,
                            )

            @pl.when(is_replay)
            def _replay_select():
                # (a, b) come from the recorded merge; the exact current
                # count of (a, b) still feeds the pending-column magnitude
                # guard, read through one row window + overlay.
                i128 = jax.lax.broadcasted_iota(I32, (1, 128), 1)
                row = mring_ref[pl.ds(step_i, 1), :]
                ra = jnp.sum(jnp.where(i128 == 0, row, 0)).astype(I32)
                rb = jnp.sum(jnp.where(i128 == 1, row, 0)).astype(I32)
                a_s = jnp.maximum(ra, 0)
                b_s = jnp.maximum(rb, 0)
                base = row_window_read(a_s, rowwin_ref, sems.at[0])
                overlay_pend(a_s)
                crow = (
                    rowwin_ref[pl.ds(a_s - base, 1), :] + pendrow_ref[...]
                )
                scalars_ref[0, _SEL_A] = a_s
                scalars_ref[0, _SEL_B] = b_s
                scalars_ref[0, _SEL_CNT] = _extract_lane(crow, b_s)
                scalars_ref[0, _SEL_STOP] = (ra < 0).astype(I32)

            @pl.when(jnp.logical_not(is_replay))
            def _select_verify():
                def vcond(c):
                    ok, _, _ = c
                    return jnp.logical_not(ok)

                def vbody(c):
                    rm = row_max_ref[...]
                    m = jnp.max(rm)
                    cand = rm == m
                    a = _argmax_lanes(jnp.where(cand, lex, -1))
                    base = row_window_read(a, rowwin_ref, sems.at[0])
                    overlay_pend(a)
                    row = (
                        rowwin_ref[pl.ds(a - base, 1), :]
                        + pendrow_ref[...]
                    )
                    tm = jnp.max(row)
                    ok = (tm == m) | (m <= 0)
                    row_max_ref[...] = jnp.where(iota_v == a, tm, rm)
                    return (ok, a, jnp.minimum(tm, m))

                _, left, best_count = jax.lax.while_loop(
                    vcond, vbody,
                    (jnp.bool_(False), jnp.int32(0), jnp.int32(0)),
                )
                # rowwin still holds the confirming window (and pendrow
                # the confirming overlay); re-slice the row.
                best_row = (
                    rowwin_ref[pl.ds(left - (left // 8) * 8, 1), :]
                    + pendrow_ref[...]
                )
                right = _argmax_lanes(
                    jnp.where(best_row == best_count, lex, -1)
                )
                stop = (best_count < max(min_frequency, 1)) | (
                    best_count <= 0
                )
                scalars_ref[0, _SEL_A] = left
                scalars_ref[0, _SEL_B] = right
                scalars_ref[0, _SEL_CNT] = best_count
                scalars_ref[0, _SEL_STOP] = stop.astype(I32)

            left = scalars_ref[0, _SEL_A]
            right = scalars_ref[0, _SEL_B]
            best_count = scalars_ref[0, _SEL_CNT]
            stop_now = scalars_ref[0, _SEL_STOP] != 0
            scalars_ref[0, _STOPPED] = stop_now.astype(I32)

            @pl.when(jnp.logical_not(stop_now))
            def _do_merge():
                a = left
                b = right

                # ------------------------------------------ vocab update
                # token_bytes is stored TRANSPOSED [L, V] (tokens are
                # lanes): a [V, L<128] layout would pad every value's
                # lane dimension 8x and spill ~100 MB of registers.
                tbT = token_bytes_ref[...]  # [L, V]
                tl = token_len_ref[...]
                la = _extract_lane(tl, a)
                lb = _extract_lane(tl, b)
                iL_c = jax.lax.broadcasted_iota(I32, (L, 1), 0)
                tb_a = jnp.sum(
                    jnp.where(iota_v == a, tbT, 0), axis=1, keepdims=True
                )  # [L, 1]
                tb_b_row = jnp.sum(
                    jnp.where(iota_v == b, tbT, 0), axis=1, keepdims=True
                ).reshape(1, L)
                # merged[d] = tb_a[d] if d < la else tb_b[d - la] else -1
                sel_b = (iL_c - la) == iota_l  # [L dst, L src]
                from_b = jnp.sum(
                    jnp.where(sel_b, tb_b_row, 0), axis=1, keepdims=True
                )
                merged = jnp.where(
                    iL_c < la, tb_a,
                    jnp.where(iL_c < la + lb, from_b, -1),
                ).astype(I32)  # [L, 1]

                diff = tbT != merged
                any_diff = (jnp.max(_b2i(diff), axis=0, keepdims=True) > 0)
                first = jnp.min(
                    jnp.where(diff, iL_c, L), axis=0, keepdims=True
                )  # [1, V]
                sel_fd = iL_c == first  # [L, V]
                row_val = jnp.sum(
                    jnp.where(sel_fd, tbT, 0), axis=0, keepdims=True
                )
                q_val = jnp.sum(
                    jnp.where(sel_fd, merged, 0), axis=0, keepdims=True
                )
                less = any_diff & (row_val < q_val)
                equal = jnp.logical_not(any_diff)
                active = iota_v < next_id
                eq_active = equal & active
                exists = jnp.max(_b2i(eq_active)) > 0
                existing_id = _argmax_lanes(_b2i(eq_active))
                c = jnp.where(exists, existing_id, next_id).astype(I32)

                grow = jnp.logical_not(exists)
                insert_rank = jnp.sum(
                    jnp.where(less & active, 1, 0)
                ).astype(I32)
                lexv = lex_rank_ref[...]
                bumped = jnp.where(
                    active & (lexv >= insert_rank), lexv + 1, lexv
                )
                with_new = jnp.where(iota_v == next_id, insert_rank, bumped)
                lex_rank_ref[...] = jnp.where(grow, with_new, lexv)

                @pl.when(grow)
                def _():
                    token_bytes_ref[...] = jnp.where(
                        iota_v == next_id, merged, tbT
                    )
                    token_len_ref[...] = jnp.where(
                        iota_v == next_id, la + lb, token_len_ref[...]
                    )

                scalars_ref[0, _NEXT_ID] = next_id + grow.astype(I32)
                scalars_ref[0, _NUM_DONE] = scalars_ref[0, _NUM_DONE] + 1

                rec = jnp.concatenate(
                    [
                        a.reshape(1, 1),
                        b.reshape(1, 1),
                        c.reshape(1, 1),
                        jnp.full((1, 125), -1, I32),
                    ],
                    axis=1,
                )
                mring_ref[pl.ds(step_i, 1), :] = rec

                # ------------------------------------------------- scan
                # Block slices are read from the REF (not one whole-array
                # value) so only two [NR, 128] blocks are live at a time —
                # a whole-words value forced ~100 MB of register spills.
                # Compares are in i32: i16-vs-broadcast compares trip an
                # i1 relayout bug in Mosaic.
                if not (ablate & 1):
                    def scan_bucket(
                        wref, fl_ref, ra_ref, sa_ref, sb_ref, Wb, NRb
                    ):
                        """Flag the bucket's words containing (a, b);
                        returns the bucket's affected-word count."""
                        NBb = Wb - 1

                        def flag_blocks(win, rows):
                            flag = jnp.zeros((rows, 128), I32)
                            for k in range(NBb):
                                mk = (
                                    _sym32(win[:, k * 128 : (k + 1) * 128])
                                    == a
                                ) & (
                                    _sym32(
                                        win[
                                            :,
                                            (k + 1) * 128 : (k + 2) * 128,
                                        ]
                                    )
                                    == b
                                )
                                flag = flag | _b2i(mk)
                            return flag

                        if not words_in_hbm:
                            flag = flag_blocks(wref, NRb)
                            fl_ref[...] = flag
                            ra_ref[...] = jnp.max(
                                flag, axis=1, keepdims=True
                            )
                            return jnp.sum(flag)
                        # The word table lives in HBM: stream it through
                        # two [SG, WLb] VMEM buffers, scanning group g
                        # while group g+1's DMA is in flight. n_aff
                        # accumulates through an SMEM scalar (values
                        # cannot escape pl.when regions).
                        SG = sa_ref.shape[0]
                        NG = NRb // SG

                        def grp_copy(g, buf_ref, sem):
                            return pltpu.make_async_copy(
                                wref.at[pl.ds(g * SG, SG), :],
                                buf_ref,
                                sem,
                            )

                        def scan_grp(g, buf_ref):
                            flag = flag_blocks(buf_ref, SG)
                            fl_ref[pl.ds(g * SG, SG), :] = flag
                            ra_ref[pl.ds(g * SG, SG), :] = jnp.max(
                                flag, axis=1, keepdims=True
                            )
                            scalars_ref[0, _N_AFF] = (
                                scalars_ref[0, _N_AFF] + jnp.sum(flag)
                            )

                        scalars_ref[0, _N_AFF] = 0
                        grp_copy(0, sa_ref, sems.at[0]).start()

                        def sbody(g, _):
                            even = (g % 2) == 0
                            more = g + 1 < NG

                            @pl.when(more & even)
                            def _():
                                grp_copy(g + 1, sb_ref, sems.at[5]).start()

                            @pl.when(more & jnp.logical_not(even))
                            def _():
                                grp_copy(g + 1, sa_ref, sems.at[0]).start()

                            @pl.when(even)
                            def _():
                                grp_copy(g, sa_ref, sems.at[0]).wait()
                                scan_grp(g, sa_ref)

                            @pl.when(jnp.logical_not(even))
                            def _():
                                grp_copy(g, sb_ref, sems.at[5]).wait()
                                scan_grp(g, sb_ref)

                            return 0

                        jax.lax.fori_loop(0, NG, sbody, 0)
                        return scalars_ref[0, _N_AFF]

                    # step-level accumulators for the count update
                    # (flushes only compact+histogram into them; the HBM
                    # application happens once per step below)
                    addvecs_ref[0:4, :] = jnp.zeros((4, V), I32)
                    colmeta_ref[3 * F + 5] = 0
                    if ablate & 2:
                        flush_fn = None
                    else:
                        def flush_fn(k_used):
                            _flush_stage(
                                a, b, c,
                                stage_l_ref, stage_r_ref, stage_w_ref,
                                addvecs_ref, colmeta_ref, k_used,
                                V=V, A=A, F=F, wide_hist=wide_hist,
                            )

                    # bucket 1 (narrow words), then bucket 2 — each at
                    # its own static width; the stage/flush are shared
                    # and all of a step's cells commute
                    n_aff = scan_bucket(
                        words_ref, flags_ref, rowany_ref,
                        scan_a_ref, scan_b_ref, W, NR,
                    )
                    if not (ablate & 4):
                        _visit_affected(
                            a, b, c, n_aff,
                            words_ref, flags_ref, rowany_ref, gwin_ref,
                            stage_l_ref, stage_r_ref, stage_w_ref,
                            sems, flush_fn,
                            W=W, NR=NR, WL=WL, A=A, sym32=_sym32,
                            empty=EMPTY, direct_vmem=not words_in_hbm,
                        )
                    if HAS2:
                        n_aff2 = scan_bucket(
                            words2_ref, flags2_ref, rowany2_ref,
                            scan2_a_ref, scan2_b_ref, W2, NR2,
                        )
                        if not (ablate & 4):
                            _visit_affected(
                                a, b, c, n_aff2,
                                words2_ref, flags2_ref, rowany2_ref,
                                gwin2_ref,
                                stage_l_ref, stage_r_ref, stage_w_ref,
                                sems, flush_fn,
                                W=W2, NR=NR2, WL=WL2, A=A, sym32=_sym32,
                                empty=EMPTY, direct_vmem=not words_in_hbm,
                            )
                    if not (ablate & 4) and not (ablate & 2):
                        _apply_line_buckets(
                            a, b, c, best_count,
                            scalars_ref[0, _NEXT_ID],
                            counts_ref, row_max_ref, rowwin_ref,
                            rowwin2_ref, addvecs_ref, colacc_ref,
                            colids_v_ref, colmeta_ref, colblk_ref,
                            pendpos_ref, pendany_ref, sems,
                            V=V, F=F, iota_v=iota_v,
                        )

        return 0

    jax.lax.fori_loop(0, chunk_size, step_body, 0)

    _evict_columns(
        counts_ref, colacc_ref, colids_v_ref, colmeta_ref, colblk_ref,
        pendpos_ref, pendany_ref, sems, V=V, F=F,
    )

    cpm = pltpu.make_async_copy(
        mring_ref,
        merges_ref.at[pl.ds(chunk_start, chunk_size), :],
        sems.at[3],
    )
    cpm.start()
    cpm.wait()


def _visit_affected(
    a, b, c, n_aff,
    words_ref, flags_ref, rowany_ref, gwin_ref,
    stage_l_ref, stage_r_ref, stage_w_ref, sems, flush_fn,
    *,
    W: int, NR: int, WL: int, A: int, sym32, empty: int,
    direct_vmem: bool = False,
):
    """Apply the merge window-at-a-time, staging the emitted cells.

    One visit processes ALL flagged words of an 8-packed-row window
    (1024 word slots): the merge apply, per-lane-class changed windows,
    and cell emission are vectorized over the whole [8, WL] window — VPU
    ops there cost the same vector registers as a single row, word
    frequencies reconstruct per lane directly from the embedded limb
    blocks, and a window is visited at most once per merge step, so there
    are no same-row or same-window write hazards at all. Emitted cells
    are lane-compacted per window row and staged (extra 128-cell slices
    when a row's words emit more); ``flush_fn(k_used)`` drains the filled
    stage — the merge-loop kernel folds it into the count table through
    the row-grouped RMW machinery, the replay/emission kernel appends it
    to a per-step cell log. ``flush_fn=None`` discards the stage (the
    flush-ablation profiling variant).
    """
    NB = W - 1
    iota_nr = jax.lax.broadcasted_iota(I32, (NR, 1), 0)
    # A visit takes at most R_CAP flagged words PER WINDOW ROW, so a row
    # can never emit more cells than MAX_SLICES 128-cell stage slices
    # hold (a word's changed window emits <= 2*(W+1) cells); taken words'
    # flags are cleared and the window is simply revisited for any
    # remainder. The per-ROW cap (vs a per-window one) lets dense early
    # steps process 8*R_CAP words per visit instead of a worst-case 4.
    MAX_SLICES = min(8, (2 * NB * 128 + 127) // 128)
    R_CAP = max(1, (MAX_SLICES * 128) // (2 * W + 4))

    def outer_cond(processed):
        return processed < n_aff

    def outer_body(processed):
        stage_l_ref[...] = jnp.full((A, 128), -1, I32)
        stage_r_ref[...] = jnp.full((A, 128), -1, I32)
        stage_w_ref[...] = jnp.zeros((A, 128), I32)

        def fill_cond(carry):
            k, done = carry
            # leave room for one window's worst-case slice burst
            return (k + 8 * MAX_SLICES <= A) & (done < n_aff)

        def fill_body(carry):
            k, done = carry
            # next window with flagged words, found through the [NR, 1]
            # per-row summary (a 256x smaller seek than the flag map)
            jr = jnp.min(jnp.where(rowany_ref[...] > 0, iota_nr, BIG))
            base8 = (jr // 8) * 8
            wf = flags_ref[pl.ds(base8, 8), :]  # [8, 128]
            pend = wf > 0
            # inclusive per-row rank: lane cumsum within each window row
            lc = _b2i(pend)
            sft = 1
            while sft < 128:
                lc = lc + jnp.concatenate(
                    [jnp.zeros((8, sft), I32), lc[:, : 128 - sft]], axis=1
                )
                sft *= 2
            take = pend & (lc <= R_CAP)
            nwin = jnp.sum(_b2i(take))
            # processed words drop out of the flag map (the seek above
            # finds remaining words of this window, or the next window)
            wf_left = jnp.where(take, 0, wf)
            flags_ref[pl.ds(base8, 8), :] = wf_left
            rowany_ref[pl.ds(base8, 8), :] = jnp.max(
                wf_left, axis=1, keepdims=True
            )
            fmask_take = take

            if direct_vmem:
                # VMEM-resident word table: read the window straight off
                # the ref (no DMA round trip per visit)
                win = sym32(words_ref[pl.ds(base8, 8), :])  # [8, WL]
            else:
                cp = pltpu.make_async_copy(
                    words_ref.at[pl.ds(base8, 8), :], gwin_ref, sems.at[1]
                )
                cp.start()
                cp.wait()
                win = sym32(gwin_ref[...])  # [8, WL]

            fmask = fmask_take  # [8, 128] words processed this visit
            fm_nb = jnp.concatenate([fmask] * NB, axis=1)
            syms = win[:, : W * 128]
            l = syms[:, : NB * 128]
            r = syms[:, 128:]
            pm = (l == a) & (r == b) & fm_nb
            applied = _leftmost_nonoverlap_blocks(pm, NB)
            applied_i = _b2i(applied)
            z8 = jnp.zeros((8, 128), I32)
            applied_at = jnp.concatenate([applied_i, z8], axis=1) != 0
            removed_full = jnp.concatenate([z8, applied_i], axis=1) != 0
            newvals = jnp.where(applied_at, c, syms)
            keep = jnp.logical_not(removed_full) & (syms != empty)
            merged = _butterfly_compact_blocks(newvals, keep, W, empty)
            fm_w = jnp.concatenate([fmask] * W, axis=1)
            new_syms = jnp.where(fm_w, merged, syms)

            newwin = jnp.concatenate(
                [new_syms, win[:, W * 128 :]], axis=1
            ).astype(I16)
            if direct_vmem:
                words_ref[pl.ds(base8, 8), :] = newwin
                cpo = None
            else:
                gwin_ref[...] = newwin
                cpo = pltpu.make_async_copy(
                    gwin_ref, words_ref.at[pl.ds(base8, 8), :], sems.at[1]
                )
                cpo.start()

            # ---- cells, overlapped with the write-back DMA ----
            # per-(row, lane-class) changed windows, folded per block
            first_m = jnp.full((8, 128), BIG, I32)
            last_m = jnp.full((8, 128), -1, I32)
            napp_m = jnp.zeros((8, 128), I32)
            for kk in range(NB):
                blk = applied_i[:, kk * 128 : (kk + 1) * 128]
                first_m = jnp.minimum(
                    first_m, jnp.where(blk > 0, kk, BIG)
                )
                last_m = jnp.maximum(last_m, jnp.where(blk > 0, kk, -1))
                napp_m = napp_m + blk
            in_old = jnp.concatenate(
                [
                    (kk >= first_m - 1) & (kk <= last_m + 1)
                    for kk in range(NB)
                ],
                axis=1,
            )
            in_new = jnp.concatenate(
                [
                    (kk >= first_m - 1) & (kk <= last_m + 1 - napp_m)
                    for kk in range(NB)
                ],
                axis=1,
            )

            # per-lane word frequency straight from the limb blocks
            f128 = (win[:, W * 128 : (W + 1) * 128] & 0xFFFF) | (
                win[:, (W + 1) * 128 :] << 16
            )
            f_nb = jnp.concatenate([f128] * NB, axis=1)

            nl = new_syms[:, : NB * 128]
            nr = new_syms[:, 128:]
            cv = jnp.concatenate(
                [
                    fm_nb & (r != empty) & in_old,
                    fm_nb & (nr != empty) & in_new,
                ],
                axis=1,
            )
            cl = jnp.concatenate([l, nl], axis=1)
            cr = jnp.concatenate([r, nr], axis=1)
            cw = jnp.concatenate([-f_nb, f_nb], axis=1)
            # (l, r, w) compact TOGETHER on one shared rank (stage pads:
            # l = -1 marks an empty slot in both narrow and wide modes —
            # live cell symbols are always >= 0 there)
            clc, crc, cwc = _compact_lanes_multi(
                [cl, cr, cw], [-1, -1, 0], cv
            )
            ccount = jnp.sum(_b2i(cv), axis=1, keepdims=True)  # [8, 1]
            cmax = jnp.max(ccount)

            kpos = pl.multiple_of(k, 8)
            stage_l_ref[pl.ds(kpos, 8), :] = clc[:, :128]
            stage_r_ref[pl.ds(kpos, 8), :] = crc[:, :128]
            stage_w_ref[pl.ds(kpos, 8), :] = cwc[:, :128]
            used = jnp.int32(8)
            for sl in range(1, MAX_SLICES):
                lo = sl * 128
                sl_needed = cmax > lo

                @pl.when(sl_needed)
                def _(sl=sl, lo=lo):
                    kp = pl.multiple_of(k + sl * 8, 8)
                    stage_l_ref[pl.ds(kp, 8), :] = clc[:, lo : lo + 128]
                    stage_r_ref[pl.ds(kp, 8), :] = crc[:, lo : lo + 128]
                    stage_w_ref[pl.ds(kp, 8), :] = cwc[:, lo : lo + 128]

                used = used + jnp.where(sl_needed, 8, 0)

            if cpo is not None:
                cpo.wait()
            return (k + used, done + nwin)

        k_used, done = jax.lax.while_loop(
            fill_cond, fill_body, (jnp.int32(0), processed)
        )
        if flush_fn is not None:
            flush_fn(k_used)
        return done

    jax.lax.while_loop(outer_cond, outer_body, jnp.int32(0))


def _slab_size(V: int) -> int:
    s = 2048
    while V % s != 0:
        s //= 2
    return s


def _flush_stage(
    a, b, c,
    stage_l_ref, stage_r_ref, stage_w_ref,
    addvecs_ref, colmeta_ref, used,
    *,
    V: int, A: int, F: int, wide_hist: bool = False,
):
    """Fold staged cells into the step's line-bucket accumulators.

    Merging (a, b) -> c only changes table cells in column a, column c,
    row b, row c, and the (a, b) cell (the VMEM fused kernel's proven
    delta structure); every emitted cell therefore classifies into one of
    those buckets — or is part of an off-line old/new pair whose
    contributions sum to zero and can be dropped. This per-flush pass is
    pure compute (compact + MXU histogram into ``addvecs``); the HBM/
    pending-buffer application happens once per step in
    `_apply_line_buckets`.
    """
    _SLAB = _slab_size(V)
    # Compact (l, r, w) together with ONE shared rank computation, over a
    # tier LADDER sized to the rows actually staged: the typical 1-visit
    # step compacts 1k lanes instead of A*128, and a 2-4-window step 2-4k
    # instead of jumping straight to the full tier (rows past ``used``
    # hold only the -1/0 reset pattern, so every tier produces identical
    # results). The cell count and the lone off-line (a, b) cell reduce
    # over the SAME in-tier compacted values, through two spare SMEM
    # slots — previously two full [A, 128] value reads per flush.
    def compact_tier(T: int):
        cap_t = T * 128
        lg = stage_l_ref[0:T, :].reshape(1, cap_t)
        rg = stage_r_ref[0:T, :].reshape(1, cap_t)
        wg = stage_w_ref[0:T, :].reshape(1, cap_t)
        valid = (lg >= 0) & (wg != 0)
        lgc, rgc, cwc = _compact_lanes_multi(
            [lg, rg, wg], [-1, -1, 0], valid
        )
        stage_l_ref[0:T, :] = lgc.reshape(T, 128)
        stage_r_ref[0:T, :] = rgc.reshape(T, 128)
        stage_w_ref[0:T, :] = cwc.reshape(T, 128)
        colmeta_ref[3 * F + 2] = jnp.sum(_b2i(cwc != 0))
        colmeta_ref[3 * F + 3] = jnp.sum(
            jnp.where((lgc == a) & (rgc == b), cwc, 0)
        )

    tiers = [t for t in (8, 16, 32, 64, 128) if t < A] + [A]
    lower = 0
    for T in tiers:
        cond = (used <= T) if lower == 0 else (used > lower) & (used <= T)

        @pl.when(cond)
        def _(T=T):
            compact_tier(T)

        lower = T

    n_cells = colmeta_ref[3 * F + 2]
    # Two-tier histogram (r5): heavy steps used to pay one [6, 128]-K
    # matmul round per 128 cells — thousands of rounds per dense merge
    # at 1 GB scale, which (not the table stream) dominated streaming
    # mode at 7.9 ms/step. Full 8-row (1024-cell) passes amortize the
    # classify/one-hot overhead 8x over the bulk; the tail then runs at
    # the original 1-row width so small warm steps (a few hundred cells)
    # don't pay a 1024-wide pass. Limb sums stay exact: <= 1024 values
    # < 2^13 per f32 accumulator stays under 2^24.
    # dvec rows (accumulated across the step's flushes; zeroed by
    # the kernel's step body at step start):
    #            0 = col a (keyed by l), 1 = col c (keyed by l),
    #            2 = row b (keyed by r), 3 = row c (keyed by r)

    def chunk_body_at(row0, CH: int):
        CL = CH * 128
        kpos = pl.multiple_of(row0, CH) if CH > 1 else row0
        l_ch = stage_l_ref[pl.ds(kpos, CH), :].reshape(1, CL)
        r_ch = stage_r_ref[pl.ds(kpos, CH), :].reshape(1, CL)
        w_ch = stage_w_ref[pl.ds(kpos, CH), :].reshape(1, CL)
        live = l_ch >= 0
        m_ab = live & (l_ch == a) & (r_ch == b)
        m_ca = live & jnp.logical_not(m_ab) & (r_ch == a)
        m_cc = live & jnp.logical_not(m_ab) & jnp.logical_not(m_ca) & (
            r_ch == c
        )
        rest = live & jnp.logical_not(m_ab | m_ca | m_cc)
        m_rb = rest & (l_ch == b)
        m_rc = rest & jnp.logical_not(m_rb) & (l_ch == c)

        wl = jnp.concatenate(
            [jnp.where(m_ca, w_ch, 0), jnp.where(m_cc, w_ch, 0)], axis=0
        )  # [2, CL] keyed by l
        wr = jnp.concatenate(
            [jnp.where(m_rb, w_ch, 0), jnp.where(m_rc, w_ch, 0)], axis=0
        )  # [2, CL] keyed by r
        key_l = jnp.where(m_ca | m_cc, l_ch, V)  # [1, CL]
        key_r = jnp.where(m_rb | m_rc, r_ch, V)

        hi = jax.lax.Precision.HIGHEST

        def hist(wmat, key_row, out_row):
            # The 3 12-bit weight limbs stack into ONE [6, slab] matmul
            # per slab (exact: each limb-row sums <= CL values < 2^13 in
            # f32, recombined in i32); slabs no key lands in are skipped
            # entirely — a typical step's cells touch 1-2 of the V/2048
            # slabs, so this drops ~90% of the per-flush MXU dispatches.
            h2 = wmat >> 24
            rem12 = wmat - (h2 << 24)
            h1 = rem12 >> 12
            h0 = rem12 - (h1 << 12)
            stacked = jnp.concatenate([h2, h1, h0], axis=0).astype(F32)
            key_sub = key_row.reshape(CL, 1)
            # One scalar bitmask of present slabs (bit sb set iff any
            # live key falls in slab sb) via a [NS, CL] membership
            # compare — ONE vector->scalar sync instead of a per-slab
            # reduction-and-branch (which measured ~1.3 s/run of
            # scalar-pipeline stalls). Requires V // _SLAB <= 31.
            NSL = V // _SLAB
            kdiv_r = key_row // _SLAB  # [1, CL]; dead keys map past NSL
            iota_ns = jax.lax.broadcasted_iota(I32, (NSL, 1), 0)
            hit = jnp.max(
                _b2i(kdiv_r == iota_ns), axis=1, keepdims=True
            )  # [NSL, 1]
            smask = jnp.sum(
                jnp.where(hit > 0, 1 << jnp.minimum(iota_ns, 30), 0)
            )
            # the one-hot runs in <= 256-key sub-chunks so its [K, slab]
            # f32 temporary stays small (a CL-wide one-hot held an 8 MB
            # VMEM value that pressured the whole kernel's allocation)
            KC = min(CL, 256)
            for sb in range(V // _SLAB):
                base = sb * _SLAB

                @pl.when(((smask >> sb) & 1) != 0)
                def _(base=base):
                    d6 = jnp.zeros((6, _SLAB), F32)
                    for kq in range(CL // KC):
                        oh = (
                            key_sub[kq * KC : (kq + 1) * KC, :]
                            == jax.lax.broadcasted_iota(
                                I32, (KC, _SLAB), 1
                            )
                            + base
                        ).astype(F32)
                        d6 = d6 + jax.lax.dot_general(
                            stacked[:, kq * KC : (kq + 1) * KC], oh,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=F32, precision=hi,
                        )  # [6, _SLAB]
                    d = (
                        d6[0:2, :].astype(I32) * (1 << 24)
                        + d6[2:4, :].astype(I32) * (1 << 12)
                        + d6[4:6, :].astype(I32)
                    )
                    addvecs_ref[
                        out_row : out_row + 2, pl.ds(base, _SLAB)
                    ] = (
                        addvecs_ref[
                            out_row : out_row + 2, pl.ds(base, _SLAB)
                        ]
                        + d
                    )

        @pl.when(jnp.min(key_l) < V)
        def _():
            hist(wl, key_l, 0)

        @pl.when(jnp.min(key_r) < V)
        def _():
            hist(wr, key_r, 2)

    # The wide tier compiles only for streaming-mode problems (1 GB
    # class, dense steps staging 10^4-10^5 cells); VMEM-mode workloads
    # measured ~1 s/run SLOWER with it present (warm steps stage a few
    # hundred cells; the wider pass bought nothing and its temporaries
    # pressured the whole kernel), so they keep the pure 128-cell path.
    CHW = 8  # wide-pass stage rows (1024 cells per pass)
    if wide_hist:
        n_wide = n_cells // (CHW * 128)

        def wide_body(ck, _):
            chunk_body_at(ck * CHW, CHW)
            return 0

        jax.lax.fori_loop(0, n_wide, wide_body, 0)
    else:
        n_wide = jnp.int32(0)
    tail0 = n_wide * CHW
    n_tail = (n_cells - n_wide * CHW * 128 + 127) // 128

    def tail_body(ck, _):
        chunk_body_at(tail0 + ck, 1)
        return 0

    jax.lax.fori_loop(0, n_tail, tail_body, 0)

    colmeta_ref[3 * F + 5] = colmeta_ref[3 * F + 5] + colmeta_ref[3 * F + 3]


def _apply_line_buckets(
    a, b, c, best_count, live_hi,
    counts_ref, row_max_ref, rowwin_ref, rowwin2_ref,
    addvecs_ref, colacc_ref, colids_v_ref, colmeta_ref, colblk_ref,
    pendpos_ref, pendany_ref, sems,
    *,
    V: int, F: int, iota_v,
):
    """Apply a step's accumulated line-bucket deltas (once per step).

    Rows b, c and the (a, b) cell apply as window RMWs with exact
    row-max refresh; column deltas accumulate in the pending-column
    buffer (f32, exact while magnitudes stay under 2^24 — guarded by
    per-slot magnitude tracking with early eviction) and row_max takes
    their positive parts as a bound, repaired lazily by the read-through
    verify.
    """
    d_ab = colmeta_ref[3 * F + 5]

    # evict-all before this step's accumulates could overflow slots or
    # f32 exactness (per-slot magnitudes; the running max makes the
    # guard one compare). Per-slot "mag" counts both the number of
    # accumulates into the slot (each adds >= 1) and a bound on the hi
    # limb's total magnitude (each accumulate adds
    # <= (best_count >> 12) + 1 — sound because every count in the table
    # is <= best_count when the step's merge is selected, so a step's
    # total per-cell delta is too). mag < 4096 keeps the lo limb exact
    # (< 4096 accumulates of values < 4096 stays under 2^24) and the hi
    # limb trivially so.
    @pl.when(
        (colmeta_ref[3 * F] >= F - 2)
        | (colmeta_ref[3 * F + 1] + (best_count >> 12) + 1 > 4095)
    )
    def _():
        _evict_columns(
            counts_ref, colacc_ref, colids_v_ref, colmeta_ref,
            colblk_ref, pendpos_ref, pendany_ref, sems, V=V, F=F,
        )

    # ---- rows b, c and the (a, b) cell: window RMWs, exact row_max ----
    # HBM slices must be 8-row aligned, so each row moves as its aligned
    # [8, rows] window — "rows" being a power-of-2 slab count covering
    # next_id (r5): every delta lane is a live symbol id and dead lanes
    # hold count 0, so truncating the window keeps both the update and
    # the row-max refresh exact while roughly halving the RMW bytes on
    # average (16x during early chunks). b != c always (c's byte string
    # strictly contains b's): when they share a window ONE fused RMW
    # handles both rows; otherwise the two round-trips overlap on
    # separate buffers and semaphores. Zero-delta rows skip their
    # round-trip entirely (row_max stays a valid upper bound untouched).
    nzb = jnp.max(jnp.abs(addvecs_ref[2:3, :])) > 0
    nzc = jnp.max(jnp.abs(addvecs_ref[3:4, :])) > 0
    base_b = (b // 8) * 8
    base_c = (c // 8) * 8
    fused = nzb & nzc & (base_b == base_c)
    sep_b = nzb & jnp.logical_not(fused)
    sep_c = nzc & jnp.logical_not(fused)

    sl = _slab_size(V)
    NS = V // sl
    # Single full-width branch: lane-laddered row windows were measured
    # ~1 s/run SLOWER at the 100 MB flagship despite moving fewer bytes
    # (the extra predicated DMA descriptors cost more in Mosaic
    # scheduling than the skipped bytes saved — rows move at full HBM
    # bandwidth either way). The eviction path keeps its ladder: there
    # the skipped bytes are 10-100x larger per transfer.
    ladder = [NS]
    nb_needed = (live_hi + sl - 1) // sl

    def rows_rmw(width: int):
        def rmw_read(base, buf_ref, sem):
            return pltpu.make_async_copy(
                counts_ref.at[pl.ds(base, 8), pl.ds(0, width)],
                buf_ref.at[:, pl.ds(0, width)],
                sem,
            )

        def rmw_write(base, buf_ref, sem):
            return pltpu.make_async_copy(
                buf_ref.at[:, pl.ds(0, width)],
                counts_ref.at[pl.ds(base, 8), pl.ds(0, width)],
                sem,
            )

        def rmw_apply(x, base, buf_ref, addvec):
            sub = x - base
            row = buf_ref[pl.ds(sub, 1), pl.ds(0, width)] + addvec
            buf_ref[pl.ds(sub, 1), pl.ds(0, width)] = row
            # The bound must cover this row's PENDING positive column
            # deltas too (the table row alone under-bounds the true
            # max); lanes past ``width`` hold 0, so the truncated max
            # equals the full-row max (counts are nonnegative).
            bound = jnp.max(row) + _extract_lane(pendpos_ref[...], x)
            row_max_ref[...] = jnp.where(
                iota_v == x, bound, row_max_ref[...]
            )

        addv_b = addvecs_ref[2:3, pl.ds(0, width)]
        addv_c = addvecs_ref[3:4, pl.ds(0, width)]
        cp_rb = rmw_read(base_b, rowwin_ref, sems.at[2])
        cp_rc = rmw_read(base_c, rowwin2_ref, sems.at[4])
        cp_wb = rmw_write(base_b, rowwin_ref, sems.at[2])
        cp_wc = rmw_write(base_c, rowwin2_ref, sems.at[4])

        @pl.when(fused)
        def _():
            cp_rb.start()
            cp_rb.wait()
            rmw_apply(b, base_b, rowwin_ref, addv_b)
            rmw_apply(c, base_b, rowwin_ref, addv_c)
            cp_wb.start()
            cp_wb.wait()

        @pl.when(sep_b)
        def _():
            cp_rb.start()

        @pl.when(sep_c)
        def _():
            cp_rc.start()

        @pl.when(sep_b)
        def _():
            cp_rb.wait()
            rmw_apply(b, base_b, rowwin_ref, addv_b)
            cp_wb.start()

        @pl.when(sep_c)
        def _():
            cp_rc.wait()
            rmw_apply(c, base_c, rowwin2_ref, addv_c)
            cp_wc.start()

        @pl.when(sep_b)
        def _():
            cp_wb.wait()

        @pl.when(sep_c)
        def _():
            cp_wc.wait()

        # Row a (the (a, b) cell) may share a window with row b or c, so
        # it runs strictly after both write-backs completed.
        @pl.when(d_ab != 0)
        def _():
            base_a = (a // 8) * 8
            cp_ra = rmw_read(base_a, rowwin_ref, sems.at[2])
            cp_ra.start()
            cp_ra.wait()
            iota_w = jax.lax.broadcasted_iota(I32, (1, width), 1)
            rmw_apply(
                a, base_a, rowwin_ref, jnp.where(iota_w == b, d_ab, 0)
            )
            cp_wa = rmw_write(base_a, rowwin_ref, sems.at[2])
            cp_wa.start()
            cp_wa.wait()

    _prev = 0
    for _nb in ladder:
        @pl.when((nb_needed > _prev) & (nb_needed <= _nb))
        def _(_nb=_nb):
            rows_rmw(_nb * sl)

        _prev = _nb

    # ---- columns a, c: pending-column accumulator ----
    def col_accumulate(col_id, dvec_row):
        dvec = addvecs_ref[dvec_row : dvec_row + 1, :]

        @pl.when(jnp.max(jnp.abs(dvec)) > 0)
        def _():
            nsl = colmeta_ref[3 * F]
            match = colids_v_ref[...] == col_id
            have = jnp.max(_b2i(match)) > 0
            slot_existing = _argmax_lanes(
                _b2i(match).reshape(1, F)
            )
            slot = jnp.where(have, slot_existing, nsl).astype(I32)
            colmeta_ref[3 * F] = nsl + jnp.where(have, 0, 1)
            colmeta_ref[slot] = col_id
            # per-slot mag: one accumulate raises |hi| by at most
            # (best_count >> 12) + 1 and the accumulate count by 1
            oldmag = jnp.where(have, colmeta_ref[F + slot], 0)
            newmag = oldmag + (best_count >> 12) + 1
            colmeta_ref[F + slot] = newmag
            colmeta_ref[3 * F + 1] = jnp.maximum(
                colmeta_ref[3 * F + 1], newmag
            )
            # per-slot max delta row: eviction skips table slabs above
            # it (the addend there is provably zero), and the slab
            # presence bitmask lets the overlay scatter skip slabs with
            # no pending column
            maxrow = jnp.max(
                jnp.where(dvec != 0, iota_v, -1)
            ).astype(I32)
            oldmax = jnp.where(have, colmeta_ref[2 * F + slot], -1)
            colmeta_ref[2 * F + slot] = jnp.maximum(oldmax, maxrow)
            colmeta_ref[3 * F + 4] = colmeta_ref[3 * F + 4] | (
                1 << (col_id // _slab_size(V))
            )
            colids_v_ref[...] = jnp.where(
                jax.lax.broadcasted_iota(I32, (F, 1), 0) == slot,
                col_id,
                colids_v_ref[...],
            )
            # split into limbs: dvec = dhi * 4096 + dlo with dlo in
            # [0, 4096) — each limb accumulates exactly in f32
            dhi = dvec >> 12
            dlo = dvec - (dhi << 12)
            colacc_ref[pl.ds(slot, 1), :] = (
                colacc_ref[pl.ds(slot, 1), :] + dlo.astype(F32)
            )
            colacc_ref[pl.ds(slot + F, 1), :] = (
                colacc_ref[pl.ds(slot + F, 1), :] + dhi.astype(F32)
            )
            pos = jnp.maximum(dvec, 0)
            row_max_ref[...] = row_max_ref[...] + pos
            pendpos_ref[...] = pendpos_ref[...] + pos
            pendany_ref[...] = pendany_ref[...] | _b2i(dvec != 0)

    col_accumulate(a, 0)
    col_accumulate(c, 1)


def _evict_columns(
    counts_ref, colacc_ref, colids_v_ref, colmeta_ref, colblk_ref,
    pendpos_ref, pendany_ref, sems, *, V: int, F: int,
):
    """Materialize all pending columns into the HBM table, block-grouped.

    For each dirty 128-column block: a one-hot [F, 128] selector maps
    slots to their lane, ONE f32 matmul contracting the slot dimension
    builds the [V, 128] addend (each output cell has at most one
    contributing slot — slots are unique per column — so f32 is exact
    while magnitudes stay under 2^24, which the flush's tracking
    guarantees), and the table block is read-modify-written. True counts
    do not change (pending work moves into the table), so row_max stays
    a valid bound untouched.
    """

    @pl.when(colmeta_ref[3 * F] > 0)
    def _():
        # distinct dirty blocks: each handled at the FIRST slot
        # referencing it
        nsl = colmeta_ref[3 * F]

        def slot_body(s, _):
            cid = colmeta_ref[s]
            blk = cid // 128

            # first slot with this block?
            def chk(t, acc):
                return acc | ((colmeta_ref[t] // 128) == blk)

            seen_before = jax.lax.fori_loop(0, s, chk, jnp.bool_(False))

            @pl.when(jnp.logical_not(seen_before) & (cid >= 0))
            def _():
                # highest delta row across this block's slots: table
                # rows above it have an all-zero addend (every cell's
                # left symbol is a live id), so the RMW covers only a
                # power-of-2 slab count that reaches the bound — ONE
                # contiguous DMA each way per block (a per-slab DMA loop
                # measured WORSE: ~1000 serialized small copies per
                # eviction paid more latency than the skipped bytes
                # saved). During early chunks one slab moves instead of
                # all V rows.
                def bnd(t, acc):
                    same = (colmeta_ref[t] // 128) == blk
                    return jnp.maximum(
                        acc,
                        jnp.where(same, colmeta_ref[2 * F + t], -1),
                    )

                bound = jax.lax.fori_loop(0, nsl, bnd, jnp.int32(-1))
                sel = (
                    (colids_v_ref[...] - blk * 128)
                    == jax.lax.broadcasted_iota(I32, (F, 128), 1)
                ) & (colids_v_ref[...] >= 0)
                self_f32 = sel.astype(F32)
                bb = pl.multiple_of(blk * 128, 128)
                # slabbed over V (sublane dim of the addend): no [V, 128]
                # or [F, V] value stays live; one matmul per limb, then
                # recombined in i32 (each limb exact in f32 under the
                # flush's mag tracking; the true value fits i32)
                sl = _slab_size(V)
                hi_p = jax.lax.Precision.HIGHEST
                NS = V // sl
                nb_needed = bound // sl + 1  # >= 1 (bound >= 0 for live)
                ladder = []
                nb = 1
                while nb < NS:
                    ladder.append(nb)
                    nb *= 2
                ladder.append(NS)
                prev = 0
                for nb in ladder:
                    rows = nb * sl

                    @pl.when((nb_needed > prev) & (nb_needed <= nb))
                    def _(nb=nb, rows=rows):
                        cp = pltpu.make_async_copy(
                            counts_ref.at[
                                pl.ds(0, rows), pl.ds(bb, 128)
                            ],
                            colblk_ref.at[pl.ds(0, rows), :],
                            sems.at[2],
                        )
                        cp.start()
                        cp.wait()
                        for sb in range(nb):
                            lo = sb * sl
                            add_lo = jax.lax.dot_general(
                                colacc_ref[0:F, pl.ds(lo, sl)],
                                self_f32,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=F32,
                                precision=hi_p,
                            ).astype(I32)  # [sl, 128]
                            add_hi = jax.lax.dot_general(
                                colacc_ref[F : 2 * F, pl.ds(lo, sl)],
                                self_f32,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=F32,
                                precision=hi_p,
                            ).astype(I32)
                            colblk_ref[pl.ds(lo, sl), :] = (
                                colblk_ref[pl.ds(lo, sl), :]
                                + add_hi * 4096
                                + add_lo
                            )
                        cpo = pltpu.make_async_copy(
                            colblk_ref.at[pl.ds(0, rows), :],
                            counts_ref.at[
                                pl.ds(0, rows), pl.ds(bb, 128)
                            ],
                            sems.at[2],
                        )
                        cpo.start()
                        cpo.wait()

                    prev = nb

            return 0

        jax.lax.fori_loop(0, nsl, slot_body, 0)
        slz = _slab_size(V)
        for sb in range(V // slz):
            colacc_ref[:, pl.ds(sb * slz, slz)] = jnp.zeros(
                (2 * F, slz), F32
            )
        colids_v_ref[...] = jnp.full((F, 1), -1, I32)

        def reset(t, _):
            colmeta_ref[t] = -1
            colmeta_ref[F + t] = 0
            colmeta_ref[2 * F + t] = -1
            return 0

        jax.lax.fori_loop(0, F, reset, 0)
        colmeta_ref[3 * F] = 0
        colmeta_ref[3 * F + 1] = 0
        colmeta_ref[3 * F + 4] = 0
        pendpos_ref[...] = jnp.zeros((1, pendpos_ref.shape[1]), I32)
        pendany_ref[...] = jnp.zeros((1, pendany_ref.shape[1]), I32)


@partial(
    jax.jit,
    static_argnames=(
        "vocab_cap",
        "word_width",
        "word_width2",
        "byte_width",
        "num_merges",
        "chunk_size",
        "min_frequency",
        "batch_words",
        "group_rows",
        "pending_cols",
        "interpret",
        "words_in_hbm",
        "wide_hist",
        "ablate",
    ),
    donate_argnums=tuple(range(9)),
)
def hbm_merge_chunk(
    words: jax.Array,        # [NR, (W+2)*128] i16 (narrow bucket)
    words2: jax.Array,       # [NR2, (W2+2)*128] i16 (wide bucket / dummy)
    row_max: jax.Array,      # [1, V] i32
    token_bytes: jax.Array,  # [V, L] i32
    token_len: jax.Array,    # [1, V] i32
    lex_rank: jax.Array,     # [1, V] i32
    merges: jax.Array,       # [M, 4] i32
    scalars: jax.Array,      # [1, 8] i32
    counts: jax.Array,       # [V, V] i32
    chunk_cfg: jax.Array,    # [1, 4] i32: [chunk_start, 0, 0, 0]
    *,
    vocab_cap: int,
    word_width: int,
    word_width2: int = 0,
    byte_width: int,
    num_merges: int,
    chunk_size: int,
    min_frequency: int,
    batch_words: int = 512,
    group_rows: int = 16,
    pending_cols: int = 128,
    interpret: bool = False,
    words_in_hbm: bool = False,
    wide_hist: bool = False,
    ablate: int = 0,
):
    """Run ``chunk_size`` merge steps in ONE kernel dispatch.

    Returns the updated 8-tuple of state arrays (all aliased in place).
    ``group_rows`` is accepted for call-site compatibility but unused
    since the line-bucket flush replaced per-row grouping.

    ``words_in_hbm`` keeps the word table in HBM (NR must be a multiple
    of 256): the affected-word scan streams it through double-buffered
    VMEM windows and visits DMA straight from HBM — the mode that lifts
    the VMEM word-table cap to the 1 GB north-star corpus scale.

    ``ablate`` compiles phase-ablated PROFILING variants (results are NOT
    exact models): bit 0 skips everything past the vocab update, bit 2
    skips only the affected-word scan's processing, bit 1 skips the
    count-table flush. Used with replay mode to decompose per-step cost
    on real workloads (the remote PJRT link exposes no op-level profile).
    """
    V = vocab_cap
    NR, WL = words.shape
    NR2, WL2 = words2.shape
    A = batch_words
    del group_rows  # superseded by the line-bucket flush
    F = pending_cols
    if words_in_hbm and NR % 256 != 0:
        raise ValueError("words_in_hbm requires NR % 256 == 0")
    if words_in_hbm and word_width2 > 0 and NR2 % 256 != 0:
        raise ValueError("words_in_hbm requires NR2 % 256 == 0")
    SG = 256 if words_in_hbm else 8  # scan buffers are vestigial in VMEM mode
    SG2 = SG if word_width2 > 0 else 8
    kernel = partial(
        _hbm_loop_kernel,
        vocab_cap=V,
        word_width=word_width,
        word_width2=word_width2,
        byte_width=byte_width,
        num_merges=num_merges,
        chunk_size=chunk_size,
        min_frequency=min_frequency,
        copy_in=interpret,
        words_in_hbm=words_in_hbm,
        wide_hist=wide_hist or words_in_hbm,
        ablate=ablate,
    )
    out_shape = [
        jax.ShapeDtypeStruct(words.shape, words.dtype),
        jax.ShapeDtypeStruct(words2.shape, words2.dtype),
        jax.ShapeDtypeStruct(row_max.shape, row_max.dtype),
        jax.ShapeDtypeStruct(token_bytes.shape, token_bytes.dtype),
        jax.ShapeDtypeStruct(token_len.shape, token_len.dtype),
        jax.ShapeDtypeStruct(lex_rank.shape, lex_rank.dtype),
        jax.ShapeDtypeStruct(merges.shape, merges.dtype),
        jax.ShapeDtypeStruct(scalars.shape, scalars.dtype),
        jax.ShapeDtypeStruct(counts.shape, counts.dtype),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    wspec = any_ if words_in_hbm else vmem
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            wspec, wspec, vmem, vmem, vmem, vmem, any_, smem, any_, smem,
        ],
        out_specs=[wspec, wspec, vmem, vmem, vmem, vmem, any_, smem, any_],
        input_output_aliases={i: i for i in range(9)},
        scratch_shapes=[
            pltpu.VMEM((NR, 128), jnp.int32),       # flags
            pltpu.VMEM((NR, 1), jnp.int32),          # per-row any-flag
            pltpu.VMEM((NR2, 128), jnp.int32),       # flags (bucket 2)
            pltpu.VMEM((NR2, 1), jnp.int32),         # any-flag (bucket 2)
            pltpu.VMEM((8, WL), jnp.int16),          # gather window
            pltpu.VMEM((8, WL2), jnp.int16),         # gather win (bucket 2)
            pltpu.VMEM((8, V), jnp.int32),           # count-row window
            pltpu.VMEM((8, V), jnp.int32),           # second row window
            pltpu.VMEM((A, 128), jnp.int32),         # staged cell lefts
            pltpu.VMEM((A, 128), jnp.int32),         # staged cell rights
            pltpu.VMEM((A, 128), jnp.int32),         # staged cell weights
            pltpu.VMEM((4, V), jnp.int32),           # line-bucket deltas
            pltpu.VMEM((chunk_size, 128), jnp.int32),  # record ring
            pltpu.VMEM((2 * F, V), jnp.float32),     # pending cols, 2 limbs
            pltpu.VMEM((F, 1), jnp.int32),           # slot -> column id
            pltpu.SMEM((3 * F + 6,), jnp.int32),     # slot meta
            pltpu.VMEM((V, 128), jnp.int32),         # eviction block
            pltpu.VMEM((1, V), jnp.int32),           # verify overlay
            pltpu.VMEM((1, V), jnp.int32),           # pending-positive
            pltpu.VMEM((1, V), jnp.int32),           # pending-any mask
            pltpu.VMEM((2 * F, 1), jnp.float32),     # overlay limb sums
            pltpu.VMEM((SG, WL), jnp.int16),         # streaming-scan buf A
            pltpu.VMEM((SG, WL), jnp.int16),         # streaming-scan buf B
            pltpu.VMEM((SG2, WL2), jnp.int16),       # scan buf A (bucket 2)
            pltpu.VMEM((SG2, WL2), jnp.int16),       # scan buf B (bucket 2)
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # v5e carries 128 MB VMEM; the driver plans to ~100 MB
            # (hbm_driver._VMEM_BUDGET) and this cap leaves ~22 MB for
            # Mosaic temporaries (the 50k-vocab config measures ~16 MB
            # of them on top of the planned buffers).
            vmem_limit_bytes=122 * 1024 * 1024,
        ),
    )(
        words, words2, row_max, token_bytes, token_len, lex_rank, merges,
        scalars, counts, chunk_cfg,
    )


__all__ = ["hbm_merge_chunk"]
