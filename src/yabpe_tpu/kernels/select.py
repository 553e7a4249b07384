"""Best-pair selection: count argmax with exact lexicographic tie-breaking.

Device equivalent of ``max(pair_counts.items(), key=lambda x: (x[1], x[0]))``
(/root/reference/src/yet_another_bpe/trainer.py:246): highest count wins,
ties broken by the lexicographically greatest (left_bytes, right_bytes)
tuple. Byte-string order is carried by the dense per-token lex-rank table
(see yabpe_tpu.core.lexkey), so tuple comparison reduces to two integer
argmaxes: first maximize lex_rank[left] over rows containing a max-count
pair, then lex_rank[right] within that row.

Lex ranks are unique among live tokens, so both argmaxes are unambiguous
and the result is bitwise deterministic on every device.
"""

from __future__ import annotations

import jax.numpy as jnp


def select_best_pair(
    counts_flat: jnp.ndarray,
    lex_rank: jnp.ndarray,
    vocab_cap: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick the (left, right) pair with (max count, max lex tuple).

    Args:
        counts_flat: int32 [V*V] pair counts.
        lex_rank: int32 [V]; dense lex ranks of live tokens, -1 inactive.
        vocab_cap: V.

    Returns:
        (left, right, count): scalar int32 symbol ids and the winning count.
        When the table is all zero, count == 0 and ids are meaningless —
        callers gate on count.
    """
    counts = counts_flat.reshape(vocab_cap, vocab_cap)
    best_count = jnp.max(counts)
    cand = counts == best_count
    row_has = jnp.any(cand, axis=1)
    left = jnp.argmax(jnp.where(row_has, lex_rank, -1)).astype(jnp.int32)
    right = jnp.argmax(jnp.where(cand[left], lex_rank, -1)).astype(jnp.int32)
    return left, right, best_count


__all__ = ["select_best_pair"]
