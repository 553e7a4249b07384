"""Device-side lexicographic ordering of variable-length byte strings.

The reference breaks pair-count ties by the lexicographically *greatest*
pair of token byte strings, compared as a Python tuple — left token first,
then right (/root/reference/src/yet_another_bpe/trainer.py:246). Variable-
length byte-string comparison is not natively expressible over fixed-width
integer ids, so the trainer maintains, for every live token id, its dense
**lexicographic rank** among all live tokens. Pair tie-breaking then reduces
to integer argmax over ``(count, lex_rank[left], lex_rank[right])``.

Token byte strings live on device as an int32 matrix padded with -1; since
-1 < any byte value, padded fixed-width comparison reproduces the shorter-
string-is-prefix rule ("ab" < "abc") for free.

All functions here are jit-safe jnp code (they also run eagerly on the CPU
backend and are exercised that way in unit tests).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

BYTE_PAD: int = -1


def initial_token_matrix(
    token_bytes_list: list[bytes], vocab_cap: int, byte_width: int
) -> tuple[np.ndarray, np.ndarray]:
    """Host helper: pack token byte strings into the device matrix layout.

    Returns (token_bytes [vocab_cap, byte_width] int32 padded with -1,
    token_len [vocab_cap] int32).
    """
    mat = np.full((vocab_cap, byte_width), BYTE_PAD, dtype=np.int32)
    lens = np.zeros((vocab_cap,), dtype=np.int32)
    for i, tb in enumerate(token_bytes_list):
        if len(tb) > byte_width:
            raise ValueError(
                f"token of {len(tb)} bytes exceeds byte_width={byte_width}"
            )
        arr = np.frombuffer(tb, dtype=np.uint8)
        mat[i, : len(arr)] = arr
        lens[i] = len(arr)
    return mat, lens


def initial_lex_ranks(token_bytes_list: list[bytes], vocab_cap: int) -> np.ndarray:
    """Host helper: dense lex rank of each initial token among all of them.

    Inactive slots (>= len(token_bytes_list)) are filled with -1.
    """
    order = sorted(range(len(token_bytes_list)), key=lambda i: token_bytes_list[i])
    ranks = np.full((vocab_cap,), -1, dtype=np.int32)
    for rank, idx in enumerate(order):
        ranks[idx] = rank
    return ranks


def rows_vs_query(
    token_bytes: jnp.ndarray, query: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compare every row of ``token_bytes`` against one padded string.

    Args:
        token_bytes: int32 [V, L], -1 padded.
        query: int32 [L], -1 padded.

    Returns:
        (less, equal): bool [V] each — row < query / row == query under
        lexicographic byte-string order.
    """
    diff = token_bytes != query[None, :]
    any_diff = jnp.any(diff, axis=1)
    first = jnp.argmax(diff, axis=1)  # index of first differing position
    row_val = jnp.take_along_axis(token_bytes, first[:, None], axis=1)[:, 0]
    q_val = query[first]
    less = any_diff & (row_val < q_val)
    return less, ~any_diff


def concat_token_bytes(
    token_bytes: jnp.ndarray,
    token_len: jnp.ndarray,
    left: jnp.ndarray,
    right: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate the byte strings of token ids ``left`` and ``right``.

    Returns (merged [L] int32 padded with -1, merged_len). The caller
    guarantees the concatenation fits in L (merged tokens are substrings of
    some pre-token, whose byte length bounds the table width).
    """
    L = token_bytes.shape[1]
    la = token_len[left]
    lb = token_len[right]
    idx = jnp.arange(L, dtype=jnp.int32)
    from_left = idx < la
    b_idx = jnp.clip(idx - la, 0, L - 1)
    merged = jnp.where(
        from_left,
        token_bytes[left],
        jnp.where(idx < la + lb, token_bytes[right][b_idx], BYTE_PAD),
    )
    return merged.astype(jnp.int32), (la + lb).astype(jnp.int32)


def insert_lex_rank(
    lex_rank: jnp.ndarray,
    active_mask: jnp.ndarray,
    less: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute the insertion rank of a new string and shift existing ranks.

    Args:
        lex_rank: int32 [V]; dense ranks of active tokens (-1 inactive).
        active_mask: bool [V]; which slots hold live tokens.
        less: bool [V]; rows (restricted to active) strictly below the new
            string.

    Returns:
        (new_ranks, insert_rank): ranks with every active rank >= insert_rank
        bumped by one; the new string's rank.
    """
    insert_rank = jnp.sum(less & active_mask).astype(jnp.int32)
    bumped = jnp.where(active_mask & (lex_rank >= insert_rank), lex_rank + 1, lex_rank)
    return bumped, insert_rank


__all__ = [
    "BYTE_PAD",
    "initial_token_matrix",
    "initial_lex_ranks",
    "rows_vs_query",
    "concat_token_bytes",
    "insert_lex_rank",
]
