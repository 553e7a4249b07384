"""Adjacent-pair count kernels.

Replaces the reference's incremental Python dict histogram
(/root/reference/src/yet_another_bpe/trainer.py:227-235,264-294) with a dense
device-resident count table recomputed per merge step from the padded word
table. Counting is a pure commutative reduction, which is what makes the
distributed story trivial: per-shard tables are psum'd over the mesh and the
argmax is replicated-deterministic (see yabpe_tpu.dist).

Two strategies:

- ``pair_counts_dense``: scatter-add of word frequencies into a flat
  [V*V] int32 table. Exact for any count magnitude.
- ``pair_counts_matmul``: one-hot matmul formulation that rides the MXU —
  ``C = L^T @ (f * R)`` with one-hot L/R built on the fly. float32
  accumulation is exact below 2**24 per count; callers must check bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adjacent_pairs(words: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (left, right, valid) views of adjacent symbol pairs.

    words: int32 [N, W], -1 padded. Overlapping occurrences all count —
    e.g. "aaa" contributes (a,a) twice — matching the reference's
    ``for j in range(len(word)-1)`` enumeration.
    """
    left = words[:, :-1]
    right = words[:, 1:]
    valid = (left >= 0) & (right >= 0)
    return left, right, valid


def pair_counts_dense(
    words: jnp.ndarray, freqs: jnp.ndarray, vocab_cap: int
) -> jnp.ndarray:
    """Exact dense pair-count table via scatter-add.

    Args:
        words: int32 [N, W], -1 padded symbol rows.
        freqs: int32 [N] occurrence counts (0 for padding rows).
        vocab_cap: symbol-id capacity V; table is [V*V] flat.

    Returns:
        int32 [V*V]: counts[a*V + b] = sum of freqs over adjacent (a, b).
    """
    left, right, valid = adjacent_pairs(words)
    oob = vocab_cap * vocab_cap
    key = jnp.where(valid, left * vocab_cap + right, oob)
    weight = jnp.where(valid, freqs[:, None], 0).astype(jnp.int32)
    counts = jnp.zeros((vocab_cap * vocab_cap,), dtype=jnp.int32)
    return counts.at[key.reshape(-1)].add(weight.reshape(-1), mode="drop")


def pair_counts_matmul(
    words: jnp.ndarray,
    freqs: jnp.ndarray,
    vocab_cap: int,
    *,
    block_positions: int = 4096,
) -> jnp.ndarray:
    """MXU pair-count table: C[a, b] = sum_p f_p * 1{l_p=a} * 1{r_p=b}.

    Positions are processed in blocks so the transient one-hot operands stay
    small ([block, V] each); XLA accumulates the [V, V] product across
    blocks. float32 accumulation — exact while every count < 2**24.

    Returns int32 [V*V] (flat, same layout as pair_counts_dense).
    """
    left, right, valid = adjacent_pairs(words)
    flat_l = left.reshape(-1)
    flat_r = right.reshape(-1)
    flat_w = jnp.where(valid, freqs[:, None], 0).reshape(-1).astype(jnp.float32)

    total = flat_l.shape[0]
    nblocks = -(-total // block_positions)
    pad_to = nblocks * block_positions
    flat_l = jnp.pad(flat_l, (0, pad_to - total), constant_values=-1)
    flat_r = jnp.pad(flat_r, (0, pad_to - total), constant_values=-1)
    flat_w = jnp.pad(flat_w, (0, pad_to - total))
    flat_l = flat_l.reshape(nblocks, block_positions)
    flat_r = flat_r.reshape(nblocks, block_positions)
    flat_w = flat_w.reshape(nblocks, block_positions)

    ids = jnp.arange(vocab_cap, dtype=jnp.int32)

    def block_body(carry, inputs):
        bl, br, bw = inputs
        onehot_l = (bl[:, None] == ids[None, :]).astype(jnp.float32)
        onehot_r = (br[:, None] == ids[None, :]).astype(jnp.float32) * bw[:, None]
        # precision=HIGHEST keeps f32 multiplication exact on TPU (the MXU
        # default lowers f32 to one-pass bf16, which rounds counts > 256).
        carry = carry + jax.lax.dot_general(
            onehot_l,
            onehot_r,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return carry, None

    init = jnp.zeros((vocab_cap, vocab_cap), dtype=jnp.float32)
    counts, _ = jax.lax.scan(block_body, init, (flat_l, flat_r, flat_w))
    return counts.reshape(-1).astype(jnp.int32)


__all__ = ["adjacent_pairs", "pair_counts_dense", "pair_counts_matmul"]
