"""Compile/run checks + timings for the last unknown HBM-kernel primitives.

  T1. VMEM->VMEM DMA gather with a DYNAMIC LANE offset ([W,1] word columns)
  T2. i16 words: compares + sublane-shift matching on [W, N] i16
  T3. transposed hot block: sublane-dynamic RMW row add [1, V]
  T4. in-kernel [128, V] -> [V, 128] i32 transpose (hot-block flush prep)
  T5. HBM column-block flush: [V, 128] tile-aligned DMA write
  T6. d-vec build in [2, SLAB] lane-major orientation

Run: python scripts/microbench_hbm_v3.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = 32768
N = 382_000
W = 32
A = 32

rng = np.random.default_rng(0)


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


FLOOR = 0.026  # measured link floor (B0)


# ------------------------------------------------------------------- T1
STEPS1 = 1024


def gather_kernel(idx_ref, words_ref, out_ref, gbuf, sems):
    def step(i, acc):
        def one(j, _):
            cp = pltpu.make_async_copy(
                words_ref.at[:, pl.ds(idx_ref[i, j], 1)],
                gbuf.at[:, pl.ds(j, 1)],
                sems.at[j % 8],
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, A, one, 0)
        return acc + jnp.sum(gbuf[...].astype(jnp.int32))

    out_ref[0, 0] = jax.lax.fori_loop(0, STEPS1, step, jnp.int32(0))


@jax.jit
def run_gather(idx, words):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((W, A), jnp.int32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(idx, words)


idx = jnp.asarray(rng.integers(0, N, size=(STEPS1, A), dtype=np.int32))
words_i32 = jnp.asarray(rng.integers(0, 256, size=(W, N), dtype=np.int32))
try:
    t = timeit(run_gather, idx, words_i32)
    print(f"T1 DMA lane-gather: {(t-FLOOR)/STEPS1*1e6:.2f} us/step "
          f"({A} word DMAs serial wait)", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"T1 FAILED: {str(e)[:250]}", flush=True)
del words_i32


# ------------------------------------------------------------------- T2
STEPS2 = 1024


def scan16_kernel(ab_ref, words_ref, out_ref):
    def step(i, acc):
        a = ab_ref[i, 0]
        b = ab_ref[i, 1]
        w = words_ref[...]
        match = (w[: W - 1, :] == a.astype(jnp.int16)) & (
            w[1:, :] == b.astype(jnp.int16)
        )
        flags = jnp.max(jnp.where(match, 1, 0), axis=0).reshape(1, N)
        return acc + jnp.sum(flags)

    out_ref[0, 0] = jax.lax.fori_loop(0, STEPS2, step, jnp.int32(0))


@jax.jit
def run_scan16(ab, words):
    return pl.pallas_call(
        scan16_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(ab, words)


ab = jnp.asarray(rng.integers(0, 256, size=(STEPS2, 2), dtype=np.int32))
words16 = jnp.asarray(rng.integers(0, 256, size=(W, N)).astype(np.int16))
try:
    t = timeit(run_scan16, ab, words16)
    print(f"T2 i16 scan: {(t-FLOOR)/STEPS2*1e6:.2f} us/step", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"T2 FAILED: {str(e)[:250]}", flush=True)
del words16


# ------------------------------------------------------------------- T3+T6
STEPS3 = 2048
P = 128
SLAB = 2048


def hot_kernel(syms_ref, w_ref, offs_ref, out_ref, dbuf):
    def step(i, acc):
        syms = syms_ref[...]  # [P, 1]
        w2 = w_ref[...].astype(jnp.float32)  # [2, P]

        def slab_body(s, _):
            base = s * SLAB
            iota = jax.lax.broadcasted_iota(jnp.int32, (P, SLAB), 1) + base
            oh = (iota == syms).astype(jnp.float32)  # [P, SLAB]
            d = jax.lax.dot_general(
                w2, oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [2, SLAB]
            dbuf[:, pl.ds(base, SLAB)] = d.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, V // SLAB, slab_body, 0)
        off = offs_ref[i]
        cur = out_ref[pl.ds(off, 1), :]
        out_ref[pl.ds(off, 1), :] = cur + dbuf[0:1, :]
        return acc + 1

    jax.lax.fori_loop(0, STEPS3, step, jnp.int32(0))


@jax.jit
def run_hot(syms, w, offs, hot0):
    return pl.pallas_call(
        hot_kernel,
        out_shape=jax.ShapeDtypeStruct((128, V), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={3: 0},
        scratch_shapes=[pltpu.VMEM((2, V), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(syms, w, offs, hot0)


syms = jnp.asarray(rng.integers(0, V, size=(P, 1), dtype=np.int32))
w2 = jnp.asarray(rng.integers(-3, 4, size=(2, P), dtype=np.int32))
offs = jnp.asarray(rng.integers(0, 128, size=(STEPS3,), dtype=np.int32))
hot0 = jnp.zeros((128, V), dtype=jnp.int32)
try:
    t = timeit(run_hot, syms, w2, offs, hot0)
    print(f"T3+T6 d-vec [2,SLAB] + hotT row RMW: "
          f"{(t-FLOOR)/STEPS3*1e6:.2f} us/step", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"T3+T6 FAILED: {str(e)[:250]}", flush=True)


# ------------------------------------------------------------------- T4+T5
REPS45 = 64


def flush_kernel(hot_ref, blk_ref, table_ref, out_table, tbuf, sem):
    def step(i, _):
        tbuf[...] = jnp.swapaxes(hot_ref[...], 0, 1)  # [V, 128]
        blk = blk_ref[i]
        cp = pltpu.make_async_copy(
            tbuf, out_table.at[:, pl.ds(blk * 128, 128)], sem
        )
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(0, REPS45, step, 0)


@jax.jit
def run_flush(hot, blks, table):
    return pl.pallas_call(
        flush_kernel,
        out_shape=jax.ShapeDtypeStruct((V, V), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((V, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(hot, blks, table)


hot = jnp.asarray(rng.integers(0, 100, size=(128, V), dtype=np.int32))
blks = jnp.asarray(rng.integers(0, V // 128, size=(REPS45,), dtype=np.int32))
table = jnp.zeros((V, V), dtype=jnp.int32)
try:
    t = timeit(run_flush, hot, blks, table)
    print(f"T4+T5 transpose+flush [V,128]: {(t-FLOOR)/REPS45*1e3:.2f} "
          f"ms/flush", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"T4+T5 FAILED: {str(e)[:250]}", flush=True)

print("done", flush=True)
