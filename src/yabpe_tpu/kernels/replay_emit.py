"""Replay a merge chain over a packed word shard, emitting delta cells.

The building block that composes the HBM merge-loop kernel's word-side
machinery with the data-sharded speculative protocol
(yabpe_tpu.dist.hbm_sharded): each chip replays the epoch's speculative
merge chain over ITS word shard in ONE kernel dispatch and, instead of
folding the count deltas into a local table, appends every staged cell
to a per-step cell log. The logs are what the shards exchange (one
``all_gather`` per epoch — a few hundred KB instead of the [V, V]
table); the replicated validate pass folds them into the global table
and commits the longest exact prefix.

The kernel reuses the merge-loop kernel's visit loop verbatim
(`hbm_loop._visit_affected`): the leftmost-non-overlapping apply, the
changed-window cell emission (old pairs negative, new pairs positive,
excluded cells cancel as a bijection) and the stage compaction are the
exact machinery validated on-chip by the single-chip engine — only the
stage drain differs (cell-log append vs count-table flush).

Reference semantics: the apply path matches
/root/reference/src/yet_another_bpe/trainer.py:253-294 (leftmost
non-overlapping merge within each word); selection/validation live in
the XLA layers above.

Log layout: each of the chain's ``K`` steps owns ``cps`` rows of the
[K*cps, 128] logs (cells = (left, right, weight) i32 triples; left = -1
marks an empty slot). A step whose cells exceed its ``cps * 128``
capacity sets ``ok[step] = 0`` and its log rows must be ignored — the
validate pass then commits at most the prefix before it, exactly like
the XLA speculative path's per-host delta-capacity overflow flags.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yabpe_tpu.kernels.hbm_loop import (
    I32,
    _b2i,
    _visit_affected,
)

#: Emission-stage rows. Independent of the merge-loop kernel's
#: batch_words default (512): this kernel drains the stage into the cell
#: logs (a VMEM->VMEM block copy) rather than the count-table flush, so
#: the smaller stage costs nothing and leaves VMEM for the logs.
STAGE_ROWS = 256

#: Compile-time VMEM ceiling passed to Mosaic (bytes).
VMEM_LIMIT_BYTES = 122 * 1024 * 1024


def replay_vmem_estimate(nr: int, wl: int, rows: int) -> int:
    """VMEM plan in bytes for a replay/emit dispatch (mirrors the
    pallas_call scratch + operand shapes below)."""
    return (
        2 * nr * wl * 2          # words in + aliased out VMEM windows
        + 3 * rows * 128 * 4     # cell logs
        + nr * 128 * 4 + nr * 4  # flags + per-row any-flag
        + 8 * wl * 2             # gather window
        + 3 * STAGE_ROWS * 128 * 4  # stage
    )


def max_log_rows(nr: int, wl: int, headroom: float = 0.9) -> int:
    """Largest total cell-log row count whose VMEM plan fits.

    ``headroom`` leaves slack for Mosaic temporaries. Multiple of 8;
    can be <= 0 when the word shard alone exceeds the plan (caller must
    route away — VERDICT r4 / ADVICE r4: production cps0 (8192) and the
    overflow fallback (4x that) were never VMEM-checked before dispatch).
    """
    budget = int(VMEM_LIMIT_BYTES * headroom) - replay_vmem_estimate(nr, wl, 0)
    return (budget // (3 * 128 * 4)) // 8 * 8


def _replay_emit_kernel(
    words_in,     # [NR, WL] i16 VMEM (aliased)
    chain_in,     # [K, 128] i32 VMEM: lanes 0/1/2 = a, b, c; a < 0 skips
    words_ref,    # out alias of words_in
    log_l_ref,    # [K*cps, 128] i32 VMEM
    log_r_ref,    # [K*cps, 128] i32 VMEM
    log_w_ref,    # [K*cps, 128] i32 VMEM
    ok_ref,       # (K,) i32 SMEM: 1 = full delta logged, 0 = overflow
    # scratch
    flags_ref,    # [NR, 128] i32 VMEM
    rowany_ref,   # [NR, 1] i32 VMEM
    gwin_ref,     # [8, WL] i16 VMEM
    stage_l_ref,  # [A, 128] i32 VMEM
    stage_r_ref,  # [A, 128] i32 VMEM
    stage_w_ref,  # [A, 128] i32 VMEM
    cursor_ref,   # (2,) i32 SMEM: [row cursor, this-step overflow]
    sems,         # DMA semaphores (2,)
    *,
    word_width: int,
    num_steps: int,
    cps: int,
    cps0: int,
    wide: bool,
):
    W = word_width
    NR, WL = words_in.shape
    A = stage_l_ref.shape[0]
    NB = W - 1
    EMPTY = 65535 if wide else -1

    def _sym32(x):
        v = x.astype(I32)
        return (v & 0xFFFF) if wide else v

    # VMEM-windowed outputs do not inherit the aliased input's contents;
    # copy the shard in once (DMA — a value copy would spill registers).
    cpw = pltpu.make_async_copy(words_in, words_ref, sems.at[0])
    cpw.start()

    # fori_loop, not an unrolled Python loop: production cps0 reaches 8192+
    # (the overflow fallback quadruples it), which would trace thousands of
    # iterations and blow up compile time on the real chip.
    def _log_init(s, _):
        lo = pl.multiple_of(s * 8, 8)
        log_l_ref[pl.ds(lo, 8), :] = jnp.full((8, 128), -1, I32)
        log_r_ref[pl.ds(lo, 8), :] = jnp.full((8, 128), -1, I32)
        log_w_ref[pl.ds(lo, 8), :] = jnp.zeros((8, 128), I32)
        return 0

    jax.lax.fori_loop(0, (cps0 + (num_steps - 1) * cps) // 8, _log_init, 0)

    def _ok_init(t, _):
        ok_ref[t] = 1
        return 0

    jax.lax.fori_loop(0, num_steps, _ok_init, 0)
    cpw.wait()

    i128 = jax.lax.broadcasted_iota(I32, (1, 128), 1)

    def step_body(j, _):
        row = chain_in[pl.ds(j, 1), :]
        ra = jnp.sum(jnp.where(i128 == 0, row, 0)).astype(I32)
        b = jnp.sum(jnp.where(i128 == 1, row, 0)).astype(I32)
        c = jnp.sum(jnp.where(i128 == 2, row, 0)).astype(I32)
        a = jnp.maximum(ra, 0)

        @pl.when(ra >= 0)
        def _active():
            # ---- scan: flag words containing the (a, b) pair ----
            # Block slices read from the REF so only two [NR, 128] blocks
            # are live at a time (same pattern as the merge-loop kernel).
            flag = jnp.zeros((NR, 128), I32)
            for k in range(NB):
                mk = (_sym32(words_ref[:, k * 128 : (k + 1) * 128]) == a) & (
                    _sym32(words_ref[:, (k + 1) * 128 : (k + 2) * 128]) == b
                )
                flag = flag | _b2i(mk)
            flags_ref[...] = flag
            rowany_ref[...] = jnp.max(flag, axis=1, keepdims=True)
            n_aff = jnp.sum(flag)

            # step 0 of the chain owns cps0 log rows (the epoch's first
            # merge sees the heaviest delta — the same asymmetry as the
            # XLA speculative path's cap0), later steps cps rows each
            cursor_ref[0] = jnp.where(j == 0, 0, cps0 + (j - 1) * cps)
            cursor_ref[1] = 0
            limit = jnp.where(j == 0, cps0, cps0 + j * cps)

            def drain(k_used):
                # Append the staged cells (k_used rows, always a multiple
                # of 8) to step j's log slice; past-capacity drains mark
                # the step overflowed and write nothing (a partial log
                # must never validate).
                base = cursor_ref[0]
                fits = (base + k_used <= limit) & (
                    cursor_ref[1] == 0
                )

                @pl.when(fits)
                def _():
                    def cp_body(t, _):
                        src = pl.multiple_of(t * 8, 8)
                        dst = pl.multiple_of(base + t * 8, 8)
                        log_l_ref[pl.ds(dst, 8), :] = stage_l_ref[
                            pl.ds(src, 8), :
                        ]
                        log_r_ref[pl.ds(dst, 8), :] = stage_r_ref[
                            pl.ds(src, 8), :
                        ]
                        log_w_ref[pl.ds(dst, 8), :] = stage_w_ref[
                            pl.ds(src, 8), :
                        ]
                        return 0

                    jax.lax.fori_loop(0, k_used // 8, cp_body, 0)
                    cursor_ref[0] = base + k_used

                @pl.when(jnp.logical_not(fits))
                def _():
                    cursor_ref[1] = 1

            _visit_affected(
                a, b, c, n_aff,
                words_ref, flags_ref, rowany_ref, gwin_ref,
                stage_l_ref, stage_r_ref, stage_w_ref, sems, drain,
                W=W, NR=NR, WL=WL, A=A, sym32=_sym32, empty=EMPTY,
                direct_vmem=True,
            )
            ok_ref[j] = 1 - cursor_ref[1]

        return 0

    jax.lax.fori_loop(0, num_steps, step_body, 0)


@partial(
    jax.jit,
    static_argnames=("word_width", "cps", "cps0", "wide", "interpret"),
)
def replay_emit_chunk(
    words: jax.Array,  # [NR, (W+2)*128] i16 packed shard (hbm_driver.pack_words)
    chain: jax.Array,  # [K, 128] i32: lanes 0/1/2 = (a, b, c); a < 0 skips
    *,
    word_width: int,
    cps: int = 64,
    cps0: int | None = None,
    wide: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Apply ``chain`` to the packed shard, logging per-step delta cells.

    Returns ``(words', log_l, log_r, log_w, ok)`` — logs are
    [cps0 + (K-1)*cps, 128] i32 (step 0 owns rows [0, cps0), step j > 0
    rows [cps0 + (j-1)*cps, cps0 + j*cps)), ``ok`` is [K] i32 with 0
    marking a step whose cells overflowed its capacity. ``cps0``
    (default 4*cps) gives the epoch's first merge extra room — it sees
    the heaviest delta, and a window visit consumes at least 8 log rows.
    Dispatches on whatever device ``words`` lives on (the caller places
    one shard per chip); ``interpret=True`` runs the Pallas interpreter
    (CPU tests and the virtual-mesh dry run).
    """
    NR, WL = words.shape
    K = chain.shape[0]
    W = word_width
    if cps0 is None:
        cps0 = 4 * cps
    if WL != (W + 2) * 128:
        raise ValueError(f"words width {WL} != (W+2)*128 for W={W}")
    if cps % 8 != 0 or cps <= 0 or cps0 % 8 != 0 or cps0 <= 0:
        raise ValueError("cps/cps0 must be positive multiples of 8")
    if NR % 8 != 0:
        raise ValueError("NR must be a multiple of 8")
    A = STAGE_ROWS
    rows = cps0 + (K - 1) * cps
    if rows > max_log_rows(NR, WL):
        raise ValueError(
            f"cell logs ({rows} rows) exceed the kernel VMEM plan for "
            f"NR={NR}, WL={WL} (max {max_log_rows(NR, WL)} rows); lower "
            "cps/cps0 or shard the words further"
        )

    kernel = partial(
        _replay_emit_kernel,
        word_width=W,
        num_steps=K,
        cps=cps,
        cps0=cps0,
        wide=wide,
    )
    out_shape = [
        jax.ShapeDtypeStruct(words.shape, words.dtype),
        jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((K,), jnp.int32),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vmem, vmem],
        out_specs=[vmem, vmem, vmem, vmem, smem],
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((NR, 128), jnp.int32),   # flags
            pltpu.VMEM((NR, 1), jnp.int32),     # per-row any-flag
            pltpu.VMEM((8, WL), jnp.int16),     # gather window
            pltpu.VMEM((A, 128), jnp.int32),    # staged cell lefts
            pltpu.VMEM((A, 128), jnp.int32),    # staged cell rights
            pltpu.VMEM((A, 128), jnp.int32),    # staged cell weights
            pltpu.SMEM((2,), jnp.int32),        # cursor, overflow
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
    )(words, chain)


__all__ = [
    "replay_emit_chunk",
    "replay_vmem_estimate",
    "max_log_rows",
    "STAGE_ROWS",
    "VMEM_LIMIT_BYTES",
]
