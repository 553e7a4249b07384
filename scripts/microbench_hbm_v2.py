"""Link-latency-aware re-measurement of HBM merge-kernel primitives.

The axon PJRT tunnel adds ~25-40 ms per dispatch+readback, so per-step
costs are only resolvable when STEPS x cost >> 40 ms. Every benchmark here
loops enough steps inside ONE kernel to swamp the link, and an empty-kernel
baseline measures the link floor to subtract.

Measured (flagship shapes V=32768, N=382k, W=32):

  B0. link floor: trivial kernel dispatch + 1-elem readback
  B1. words scan (i32 [W, N] layout): match pair + per-word flags + count
  B2. words scan (packed-pair i32 [W-1, N]): one compare pass
  B3. row RMW: [8, V] window DMA in -> add -> DMA out
  B4. fold pass: stream [V, V] through VMEM in [S, V] slabs + MXU addend
  B5. d-vec build: [slab, P] one-hot + matmul into [V, 2]
  B6. verify read-through: row DMA + colaccT column extract via MXU

Run: python scripts/microbench_hbm_v2.py
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
F = 128

rng = np.random.default_rng(0)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, total_s, steps, floor_s):
    per = (total_s - floor_s) / steps * 1e6
    print(f"{name}: {total_s*1e3:.1f} ms total, {per:.2f} us/step "
          f"(steps={steps})", flush=True)


# ------------------------------------------------------------------- B0
def empty_kernel(x_ref, out_ref):
    out_ref[0, 0] = x_ref[0, 0] + 1


@jax.jit
def run_empty(x):
    return pl.pallas_call(
        empty_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x)


floor = timeit(run_empty, jnp.zeros((1, 1), jnp.int32), reps=5)
print(f"B0 link floor: {floor*1e3:.1f} ms", flush=True)


# ------------------------------------------------------------------- B1
# Words scan, [W, N] i32 layout (words are lanes): match (a, b) adjacency
# via sublane shift, reduce to per-word flags + total count.
STEPS_SCAN = 1024


def scan_kernel(ab_ref, words_ref, out_ref):
    def step(i, acc):
        a = ab_ref[i, 0]
        b = ab_ref[i, 1]
        w = words_ref[...]
        match = (w[: W - 1, :] == a) & (w[1:, :] == b)
        flags = jnp.max(jnp.where(match, 1, 0), axis=0).reshape(1, N)
        return acc + jnp.sum(flags)

    out_ref[0, 0] = jax.lax.fori_loop(0, STEPS_SCAN, step, jnp.int32(0))


@jax.jit
def run_scan(ab, words):
    return pl.pallas_call(
        scan_kernel,
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


ab = jnp.asarray(rng.integers(0, 256, size=(STEPS_SCAN, 2), dtype=np.int32))
words_t = jnp.asarray(rng.integers(0, 256, size=(W, N), dtype=np.int32))
try:
    t = timeit(run_scan, ab, words_t)
    report("B1 scan [W,N] i32", t, STEPS_SCAN, floor)
except Exception as e:  # noqa: BLE001
    print(f"B1 FAILED: {str(e)[:200]}", flush=True)
del words_t


# ------------------------------------------------------------------- B2
# Packed-pair scan: PP[j] = (l << 16) | r as one i32 compare pass.
def scan2_kernel(ab_ref, pp_ref, out_ref):
    def step(i, acc):
        key = ab_ref[i, 0]
        match = pp_ref[...] == key
        flags = jnp.max(jnp.where(match, 1, 0), axis=0).reshape(1, N)
        return acc + jnp.sum(flags)

    out_ref[0, 0] = jax.lax.fori_loop(0, STEPS_SCAN, step, jnp.int32(0))


@jax.jit
def run_scan2(ab, pp):
    return pl.pallas_call(
        scan2_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(ab, pp)


pp = jnp.asarray(
    rng.integers(0, 2**22, size=(W - 1, N), dtype=np.int32)
)
try:
    t = timeit(run_scan2, ab[:, :1], pp)
    report("B2 packed-pair scan", t, STEPS_SCAN, floor)
except Exception as e:  # noqa: BLE001
    print(f"B2 FAILED: {str(e)[:200]}", flush=True)
del pp


# ------------------------------------------------------------------- B3
STEPS_RMW = 4096


def rmw_kernel(rows_ref, table_ref, out_table, rowbuf, sem):
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, V), 0)

    def step(i, acc):
        rid = rows_ref[i]
        base = (rid // 8) * 8
        sub = rid - base
        cp_in = pltpu.make_async_copy(
            table_ref.at[pl.ds(base, 8), :], rowbuf, sem
        )
        cp_in.start()
        cp_in.wait()
        rowbuf[...] = jnp.where(sub_iota == sub, rowbuf[...] + 1, rowbuf[...])
        cp_out = pltpu.make_async_copy(
            rowbuf, out_table.at[pl.ds(base, 8), :], sem
        )
        cp_out.start()
        cp_out.wait()
        return acc + rowbuf[0, 0]

    jax.lax.fori_loop(0, STEPS_RMW, step, jnp.int32(0))


@jax.jit
def run_rmw(rows, table):
    return pl.pallas_call(
        rmw_kernel,
        out_shape=jax.ShapeDtypeStruct((V, V), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, V), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rows, table)


rows = jnp.asarray(rng.integers(0, V, size=(STEPS_RMW,), dtype=np.int32))
table = jnp.zeros((V, V), dtype=jnp.int32)
try:
    t = timeit(run_rmw, rows, table, reps=2)
    report("B3 row RMW [8,V]", t, STEPS_RMW, floor)
except Exception as e:  # noqa: BLE001
    print(f"B3 FAILED: {str(e)[:200]}", flush=True)
del table


# ------------------------------------------------------------------- B4
S = 128
FOLDS = 16


def fold_kernel(colacc_ref, onehot_ref, table_ref, out_table, slab, sem):
    nslabs = V // S

    def one_fold(f, acc):
        def body(s, acc2):
            cp_in = pltpu.make_async_copy(
                table_ref.at[pl.ds(s * S, S), :], slab, sem
            )
            cp_in.start()
            cp_in.wait()
            seg = colacc_ref[pl.ds(s * S, S), :].astype(jnp.float32)  # [S,F]
            addend = jax.lax.dot_general(
                seg,
                onehot_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            slab[...] = slab[...] + addend.astype(jnp.int32)
            cp_out = pltpu.make_async_copy(
                slab, out_table.at[pl.ds(s * S, S), :], sem
            )
            cp_out.start()
            cp_out.wait()
            return acc2

        return jax.lax.fori_loop(0, nslabs, body, acc)

    jax.lax.fori_loop(0, FOLDS, one_fold, jnp.int32(0))


@jax.jit
def run_fold(colacc, onehot, table):
    return pl.pallas_call(
        fold_kernel,
        out_shape=jax.ShapeDtypeStruct((V, V), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((S, V), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(colacc, onehot, table)


colacc = jnp.asarray(rng.integers(-5, 5, size=(V, F), dtype=np.int32))
onehot = jnp.zeros((F, V), dtype=np.float32)
table = jnp.zeros((V, V), dtype=jnp.int32)
try:
    t = timeit(run_fold, colacc, onehot, table, reps=2)
    per_fold = (t - floor) / FOLDS
    gb = V * V * 4 * 2 / 1e9
    print(
        f"B4 fold: {per_fold*1e3:.2f} ms/fold ({gb/per_fold:.0f} GB/s); "
        f"amortized {per_fold*1e6/96:.1f} us/step at F={F}",
        flush=True,
    )
except Exception as e:  # noqa: BLE001
    print(f"B4 FAILED: {str(e)[:200]}", flush=True)
del table, colacc, onehot


# ------------------------------------------------------------------- B5
P = 128
SLAB = 2048
STEPS_DV = 2048


def dvec_kernel(syms_ref, w_ref, out_ref):
    def step(i, acc):
        syms = syms_ref[...].astype(jnp.int32)
        w2 = w_ref[...].astype(jnp.float32)

        def slab_body(s, acc2):
            base = s * SLAB
            iota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, P), 0) + base
            oh = (iota == syms).astype(jnp.float32)
            d = jax.lax.dot_general(
                oh, w2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[pl.ds(base, SLAB), :] = d.astype(jnp.int32)
            return acc2 + 1

        return jax.lax.fori_loop(0, V // SLAB, slab_body, acc)

    jax.lax.fori_loop(0, STEPS_DV, step, jnp.int32(0))


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
    report("B5 d-vec one-hot build", t, STEPS_DV, floor)
except Exception as e:  # noqa: BLE001
    print(f"B5 FAILED: {str(e)[:200]}", flush=True)


# ------------------------------------------------------------------- B6
# Verify read-through: row DMA [8, V] + colaccT [F, V] column extract via
# matmul with a one-hot, + max reduce.
STEPS_VER = 2048


def verify_kernel(rows_ref, table_ref, colacct_ref, out_ref, rowbuf, sem):
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)

    def step(i, acc):
        rid = rows_ref[i]
        base = (rid // 8) * 8
        cp = pltpu.make_async_copy(
            table_ref.at[pl.ds(base, 8), :], rowbuf, sem
        )
        cp.start()
        oh_a = (iota_v == rid).astype(jnp.float32).reshape(V, 1)
        pend = jax.lax.dot_general(
            colacct_ref[...].astype(jnp.float32), oh_a,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [F, 1] pending deltas for row rid per slot
        cp.wait()
        sub = rid - base
        row = rowbuf[pl.ds(sub, 1), :]
        # scatter pend onto columns: [1, F] @ onehotC [F, V] ~ use zeros
        true_max = jnp.max(row) + jnp.sum(pend).astype(jnp.int32)
        return acc + true_max

    out_ref[0, 0] = jax.lax.fori_loop(0, STEPS_VER, step, jnp.int32(0))


@jax.jit
def run_verify(rows, table, colacct):
    return pl.pallas_call(
        verify_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((8, V), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rows, table, colacct)


table = jnp.zeros((V, V), dtype=jnp.int32)
colacct = jnp.asarray(rng.integers(-5, 5, size=(F, V), dtype=np.int32))
try:
    t = timeit(run_verify, rows[:STEPS_VER], table, colacct, reps=2)
    report("B6 verify row+pend", t, STEPS_VER, floor)
except Exception as e:  # noqa: BLE001
    print(f"B6 FAILED: {str(e)[:200]}", flush=True)

print("done", flush=True)
