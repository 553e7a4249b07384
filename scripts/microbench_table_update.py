"""Micro-benchmark: strategies for updating the [V, V] pair-count table.

The round-1 profile showed the XLA scatter into a fori-carried [V*V] buffer
copies the whole table once per merge step (~0.43 ms at V=5000, dominating
at V=32768 where the table is 4.3 GB). This script measures, on the real
chip, the candidate replacements:

  A. baseline: ``table.at[keys].add(w)`` inside a fori_loop carry
  B. row-grouped: fori over R rows; dynamic_slice row -> fresh [V] scatter
     -> dynamic_update_slice back (DUS is in-place on loop carries)
  C. Pallas kernel with input_output_aliases: double-buffered row DMA +
     in-VMEM apply

plus the one-time init (pair_counts_dense) cost at V=32768.

Run: python scripts/microbench_table_update.py [V] [steps]
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

V = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = 8192          # raw delta entries per step
R = 128           # distinct rows touched per step (cap)

print(f"V={V} table={V*V*4/1e9:.2f} GB steps/chunk={STEPS} K={K} R={R}",
      flush=True)

rng = np.random.default_rng(0)


def sync(out):
    """Force completion. block_until_ready is a NO-OP under the axon PJRT
    plugin (measured: returns in 0.2 ms while the computation is still
    running); a 1-element host readback is the only reliable barrier."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
        sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


# ---------------------------------------------------------------- init cost
@partial(jax.jit, static_argnames=("vocab_cap",))
def init_dense(words, freqs, vocab_cap):
    from yabpe_tpu.kernels.pair_count import pair_counts_dense

    return pair_counts_dense(words, freqs, vocab_cap)


N, W = 382_000, 32
words_np = rng.integers(0, 256, size=(N, W), dtype=np.int32)
lens = rng.integers(2, W + 1, size=(N,))
mask = np.arange(W)[None, :] >= lens[:, None]
words_np[mask] = -1
freqs_np = rng.integers(1, 1000, size=(N,), dtype=np.int32)

words = jnp.asarray(words_np)
freqs = jnp.asarray(freqs_np)

t, table0 = timeit(lambda: init_dense(words, freqs, V), reps=2)
print(f"init pair_counts_dense: {t:.3f} s", flush=True)
del table0


# ----------------------------------------------------- synthetic step deltas
# Per step: K keys clustered in R rows (realistic: deltas touch few rows).
def make_deltas(steps):
    rows = rng.integers(0, V, size=(steps, R)).astype(np.int32)
    which = rng.integers(0, R, size=(steps, K))
    cols = rng.integers(0, V, size=(steps, K)).astype(np.int32)
    keys = rows[np.arange(steps)[:, None], which] * V + cols
    w = rng.integers(-3, 4, size=(steps, K)).astype(np.int32)
    return (
        jnp.asarray(keys.astype(np.int64)),
        jnp.asarray(w),
        jnp.asarray(rows[np.arange(steps)[:, None], which]),
        jnp.asarray(cols),
    )


keys_all, w_all, rows_all, cols_all = make_deltas(STEPS)


# --------------------------------------------------------------- strategy A
@jax.jit
def chunk_scatter(table, keys, w):
    def body(i, t):
        return t.at[keys[i]].add(w[i], mode="drop")

    return jax.lax.fori_loop(0, STEPS, body, table)


table = jnp.zeros((V * V,), dtype=jnp.int32)
t, table = timeit(chunk_scatter, table, keys_all, w_all, reps=2)
print(f"A scatter-in-carry: {t*1e3/STEPS:.3f} ms/step", flush=True)
del table


# --------------------------------------------------------------- strategy B
@jax.jit
def chunk_dus(table, rows, cols, w):
    # rows/cols/w: [STEPS, K]; group by row on device per step.
    def body(i, t):
        rk, ck, wk = rows[i], cols[i], w[i]
        order = jnp.argsort(rk)
        rk, ck, wk = rk[order], ck[order], wk[order]
        # unique row starts
        first = jnp.concatenate(
            [jnp.array([True]), rk[1:] != rk[:-1]]
        )
        row_ids = jnp.unique(rk, size=R, fill_value=-1)
        starts = jnp.searchsorted(rk, row_ids)
        ends = jnp.searchsorted(rk, row_ids, side="right")

        def row_body(j, t):
            rid = row_ids[j]
            safe = jnp.maximum(rid, 0)
            row = jax.lax.dynamic_slice(t, (safe.astype(jnp.int64) * V,), (V,))
            s, e = starts[j], ends[j]
            in_span = (jnp.arange(K) >= s) & (jnp.arange(K) < e)
            cols_m = jnp.where(in_span, ck, V)  # V = drop
            w_m = jnp.where(in_span & (rid >= 0), wk, 0)
            row = row.at[cols_m].add(w_m, mode="drop")
            return jax.lax.dynamic_update_slice(
                t, row, (safe.astype(jnp.int64) * V,)
            )

        return jax.lax.fori_loop(0, R, row_body, t)

    return jax.lax.fori_loop(0, STEPS, body, table)


table = jnp.zeros((V * V,), dtype=jnp.int32)
t, table = timeit(chunk_dus, table, rows_all, cols_all, w_all, reps=2)
print(f"B row-DUS-in-carry: {t*1e3/STEPS:.3f} ms/step", flush=True)
del table

print("done", flush=True)
