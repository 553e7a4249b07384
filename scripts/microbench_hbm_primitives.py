"""Microbench the remaining primitives of the HBM-tiled merge-loop kernel.

The planned kernel keeps the [V, V] count table in HBM, a per-row max bound
in VMEM, and updates per merge step:

  rows b, c     -> contiguous [1, V] DMA RMW        (known cheap)
  cols a, c     -> strided [V, 1] DMA RMW           (P3: cost unknown)
  d-vectors     -> either one-hot slab matmuls (small steps) or an SMEM
                   scalar-scatter histogram (large steps)  (P4/P5)

This measures, on the real chip:

  P3. [V, 1] column DMA RMW (in -> VPU add -> out), per column
  P4. SMEM scalar-scatter rate: fori_loop of dynamic SMEM RMWs
  P5. VMEM -> SMEM DMA of a [2, K] slab + SMEM -> VMEM DMA of [S, 128]
  P6. relayout: [V//128, 128] -> [1, V] reshape inside the kernel
  P7. one-hot slab matmul d-vector build: [V, P] mask + [V, P] @ [P, 2]

Run: python scripts/microbench_hbm_primitives.py [V] [steps]
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

V = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64

print(f"V={V} table={V*V*4/1e9:.2f} GB steps={STEPS}", flush=True)


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


rng = np.random.default_rng(0)

# ------------------------------------------------------------------- P3
# Column RMW: DMA table[:, c:c+1] into a [V, 1] VMEM buffer, add, DMA back.


def col_rmw_kernel(cols_ref, table_ref, out_table, colbuf, sem):
    def step(i, acc):
        c = cols_ref[i]
        cp_in = pltpu.make_async_copy(
            table_ref.at[:, pl.ds(c, 1)], colbuf, sem
        )
        cp_in.start()
        cp_in.wait()
        colbuf[...] = colbuf[...] + 1
        cp_out = pltpu.make_async_copy(
            colbuf, out_table.at[:, pl.ds(c, 1)], sem
        )
        cp_out.start()
        cp_out.wait()
        return acc + colbuf[0, 0]

    jax.lax.fori_loop(0, STEPS, step, jnp.int32(0))


@jax.jit
def run_col_rmw(cols, table):
    return pl.pallas_call(
        col_rmw_kernel,
        out_shape=jax.ShapeDtypeStruct((V, V), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((V, 1), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(cols, table)


cols = jnp.asarray(rng.integers(0, V, size=(STEPS,), dtype=np.int32))
table = jnp.zeros((V, V), dtype=jnp.int32)
try:
    t = timeit(run_col_rmw, cols, table)
    print(f"P3 column [V,1] DMA RMW: {t*1e6/STEPS:.1f} us/column", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"P3 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
del table


# ------------------------------------------------------------------- P4
# SMEM scalar-scatter histogram: K dynamic RMWs into an SMEM (R, 128) buf.
K_SC = 2048


def smem_scatter_kernel(syms_ref, w_ref, out_ref, d_smem):
    def zero(i, _):
        def zl(j, _):
            d_smem[i, j] = 0
            return 0

        return jax.lax.fori_loop(0, 128, zl, 0)

    # zero only once (cost excluded by amortizing over STEPS inner passes)
    jax.lax.fori_loop(0, V // 128, zero, 0)

    def step(s, acc):
        def body(p, acc2):
            x = syms_ref[s, p]
            w = w_ref[s, p]
            hi = x // 128
            lo = x - hi * 128
            d_smem[hi, lo] = d_smem[hi, lo] + w
            return acc2 + w

        return jax.lax.fori_loop(0, K_SC, body, acc)

    tot = jax.lax.fori_loop(0, STEPS, step, jnp.int32(0))
    out_ref[0] = tot


@jax.jit
def run_smem_scatter(syms, w):
    return pl.pallas_call(
        smem_scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((V // 128, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(syms, w)


syms = jnp.asarray(rng.integers(0, V, size=(STEPS, K_SC), dtype=np.int32))
wts = jnp.asarray(rng.integers(-3, 4, size=(STEPS, K_SC), dtype=np.int32))
try:
    t = timeit(run_smem_scatter, syms, wts)
    n = STEPS * K_SC
    print(
        f"P4 SMEM scatter: {t*1e9/n:.1f} ns/elem "
        f"({n/t/1e6:.1f} M RMW/s; SMEM d buf (V/128,128) ok)",
        flush=True,
    )
except Exception as e:  # noqa: BLE001
    print(f"P4 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ------------------------------------------------------------------- P5
# VMEM <-> SMEM DMA shuttles.
def shuttle_kernel(x_ref, out_ref, smem_buf, vmem_back, sem):
    def step(i, acc):
        cp = pltpu.make_async_copy(
            x_ref.at[:, pl.ds((i % 16) * K_SC, K_SC)], smem_buf, sem
        )
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(smem_buf, vmem_back, sem)
        cp2.start()
        cp2.wait()
        return acc + smem_buf[0, 0]

    acc = jax.lax.fori_loop(0, STEPS, step, jnp.int32(0))
    out_ref[...] = vmem_back[...] + acc


@jax.jit
def run_shuttle(x):
    return pl.pallas_call(
        shuttle_kernel,
        out_shape=jax.ShapeDtypeStruct((2, K_SC), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2, K_SC), jnp.int32),
            pltpu.VMEM((2, K_SC), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


x = jnp.asarray(rng.integers(0, 100, size=(2, 16 * K_SC), dtype=np.int32))
try:
    t = timeit(run_shuttle, x)
    print(
        f"P5 VMEM->SMEM [2,{K_SC}] + SMEM->VMEM: {t*1e6/STEPS:.1f} us/shuttle",
        flush=True,
    )
except Exception as e:  # noqa: BLE001
    print(f"P5 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ------------------------------------------------------------------- P6
# Relayout reshape [V//128, 128] -> [1, V] inside a kernel.
def relayout_kernel(x_ref, out_ref):
    def step(i, acc):
        row = x_ref[...].reshape(1, V)
        return acc + jnp.sum(row * (i + 1))

    acc = jax.lax.fori_loop(0, STEPS, step, jnp.int32(0))
    out_ref[0, 0] = acc


@jax.jit
def run_relayout(x):
    return pl.pallas_call(
        relayout_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x)


x = jnp.asarray(rng.integers(0, 100, size=(V // 128, 128), dtype=np.int32))
try:
    t = timeit(run_relayout, x)
    print(f"P6 [V/128,128]->[1,V] reshape: {t*1e6/STEPS:.1f} us", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"P6 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ------------------------------------------------------------------- P7
# One-hot slab d-vector build: onehotL [slab, P] from syms, then
# [slab, P] @ [P, 2] per slab -> d [V, 2].
P = 128
SLAB = 2048


def dvec_kernel(syms_ref, w_ref, out_ref):
    def step(i, acc):
        syms = syms_ref[...].astype(jnp.int32)  # [1, P] VMEM
        w2 = w_ref[...].astype(jnp.float32)     # [P, 2]

        def slab_body(s, acc2):
            base = s * SLAB
            iota = (
                jax.lax.broadcasted_iota(jnp.int32, (SLAB, P), 0) + base
            )
            onehot = (iota == syms).astype(jnp.float32)  # [SLAB, P]
            d = jax.lax.dot_general(
                onehot,
                w2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [SLAB, 2]
            out_ref[pl.ds(base, SLAB), :] = d.astype(jnp.int32)
            return acc2 + 1

        return jax.lax.fori_loop(0, V // SLAB, slab_body, acc)

    jax.lax.fori_loop(0, STEPS, step, jnp.int32(0))


@jax.jit
def run_dvec(syms, w):
    return pl.pallas_call(
        dvec_kernel,
        out_shape=jax.ShapeDtypeStruct((V, 2), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(syms, w)


syms = jnp.asarray(rng.integers(0, V, size=(1, P), dtype=np.int32))
w2 = jnp.asarray(rng.integers(-3, 4, size=(P, 2), dtype=np.int32))
try:
    t = timeit(run_dvec, syms, w2)
    print(f"P7 one-hot d-vec build (P={P}): {t*1e6/STEPS:.1f} us/step", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"P7 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

print("done", flush=True)
