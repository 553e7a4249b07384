"""Prototype the HBM-tiled fused merge-loop kernel's primitive costs.

Measures, on the real chip, the building blocks of a merge-step kernel that
keeps the [V, V] count table in HBM and everything else in VMEM:

  P1. per-step: 3x (row DMA in -> VPU add -> row DMA out) + a full scan of
      a VMEM-resident [N, W] words buffer + argmax-ish reductions,
      repeated STEPS times inside ONE kernel dispatch.
  P2. fold pass: stream the whole table through VMEM in [S, V] slabs,
      adding an MXU-built [S, V] addend (the column-accumulator fold).

Run: python scripts/microbench_hbm_kernel.py [V] [steps]
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 256
N, W = 382_000, 32
F = 256  # recent-column slots
S = 512  # fold slab rows

print(f"V={V} table={V*V*4/1e9:.2f} GB steps={STEPS} N={N} W={W}", flush=True)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, reps=2, warm=1):
    for _ in range(warm):
        sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# ------------------------------------------------------------------- P1
# HBM slices must be aligned to the (8, 128) tile, so the row RMW moves an
# 8-row window and blends the target row inside it. Words are lane-packed
# [N*W/128, 128] so the VMEM footprint is the true 49 MB (a [N, 32] array
# would pad lanes to 128 = 4x the memory).
M_ROWS = N * W // 128


def step_kernel(rows_ref, words_ref, table_ref, out_table, rowbuf, sem):
    # rows_ref: SMEM [STEPS, 4] row ids to touch per step
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, V), 0)

    def step(i, acc):
        # words scan: match count (stand-in for affected-row detection)
        w = words_ref[:]
        a = rows_ref[i, 0]
        b = rows_ref[i, 1]
        # adjacent within lanes; cross-lane boundary ignored (bench only)
        l = w[:, : 127]
        r = w[:, 1:]
        hit = jnp.where((l == a) & (r == b), 1, 0)
        n_aff = jnp.sum(hit)

        def rmw(j, acc2):
            rid = rows_ref[i, j]
            base = (rid // 8) * 8
            sub = rid - base
            cp_in = pltpu.make_async_copy(
                table_ref.at[pl.ds(base, 8), :], rowbuf, sem
            )
            cp_in.start()
            cp_in.wait()
            rowbuf[...] = jnp.where(
                sub_iota == sub, rowbuf[...] + n_aff + j, rowbuf[...]
            )
            cp_out = pltpu.make_async_copy(
                rowbuf, out_table.at[pl.ds(base, 8), :], sem
            )
            cp_out.start()
            cp_out.wait()
            return acc2 + jnp.max(rowbuf[...])

        return jax.lax.fori_loop(0, 3, rmw, acc)

    jax.lax.fori_loop(0, STEPS, step, jnp.int32(0))


@jax.jit
def run_steps(rows, words, table):
    return pl.pallas_call(
        step_kernel,
        out_shape=jax.ShapeDtypeStruct((V, V), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, V), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(rows, words, table)


rng = np.random.default_rng(0)
rows = jnp.asarray(rng.integers(0, V, size=(STEPS, 4), dtype=np.int32))
words = jnp.asarray(
    rng.integers(0, 256, size=(M_ROWS, 128), dtype=np.int32)
)
table = jnp.zeros((V, V), dtype=jnp.int32)

t = timeit(run_steps, rows, words, table)
print(f"P1 step kernel: {t:.3f} s total = {t*1e6/STEPS:.1f} us/step", flush=True)
del table


# ------------------------------------------------------------------- P2
def fold_kernel(recent_ref, cols_ref, table_ref, out_table, slab, sem):
    # recent_ref: [V, F] transposed column-accumulator (recentT[r, s] =
    # pending addition to counts[r, col_s]); sublane-dynamic slicing only.
    nslabs = V // S
    onehot = (
        cols_ref[:].reshape(F, 1)
        == jax.lax.broadcasted_iota(jnp.int32, (F, V), 1)
    ).astype(jnp.float32)

    def body(s, _):
        cp_in = pltpu.make_async_copy(
            table_ref.at[pl.ds(s * S, S), :], slab, sem
        )
        cp_in.start()
        cp_in.wait()
        # addend[S, V] = recentT[s*S:(s+1)*S, :] @ onehot(cols)
        seg = recent_ref[pl.ds(s * S, S), :].astype(jnp.float32)  # [S, F]
        addend = jax.lax.dot_general(
            seg,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        slab[...] = slab[...] + addend.astype(jnp.int32)
        cp_out = pltpu.make_async_copy(
            slab, out_table.at[pl.ds(s * S, S), :], sem
        )
        cp_out.start()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, nslabs, body, 0)


@jax.jit
def run_fold(recent, cols, table):
    return pl.pallas_call(
        fold_kernel,
        out_shape=jax.ShapeDtypeStruct((V, V), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((S, V), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(recent, cols, table)


recent = jnp.asarray(rng.integers(-5, 5, size=(V, F), dtype=np.int32))
cols = jnp.asarray(rng.integers(0, V, size=(F, 1), dtype=np.int32))
table = jnp.zeros((V, V), dtype=jnp.int32)
t = timeit(run_fold, recent, cols, table)
gb = V * V * 4 * 2 / 1e9
print(
    f"P2 fold pass: {t*1e3:.1f} ms ({gb/t:.0f} GB/s, "
    f"{t*1e6/STEPS:.1f} us/step amortized over {STEPS})",
    flush=True,
)
print("done", flush=True)
