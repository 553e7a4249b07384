"""Masked leftmost merge application + compaction over padded word rows.

Device equivalent of the reference's per-word merge scan
(/root/reference/src/yet_another_bpe/trainer.py:276-285): within each word,
occurrences of the best pair are replaced left-to-right without overlap
("aaa" with pair (a,a) merges positions 0-1, not 1-2), then the row is
compacted. Everything is branch-free vectorized code: the leftmost-
non-overlapping rule is a run-parity computation via an exclusive cummax,
and compaction is a stable two-operand sort along the row.

These primitives are shared by the trainer (single global pair per step) and
the encoder (per-row pair with per-position replacement symbols).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yabpe_tpu.core.wordtable import PAD


def leftmost_nonoverlapping(match: jnp.ndarray) -> jnp.ndarray:
    """Select the leftmost non-overlapping True positions per row.

    Given match[i, j] = "pair occurrence starts at column j", returns
    applied[i, j] = match[i, j] AND NOT applied[i, j-1]. Overlap is only
    possible inside runs of consecutive matches (which requires
    left == right symbol), where the applied positions are the even offsets
    within each run.
    """
    w = match.shape[1]
    iota = jnp.arange(w, dtype=jnp.int32)[None, :]
    # Last non-match column at or before j; -1 if none.
    last_false_incl = jax.lax.cummax(jnp.where(match, -1, iota), axis=1)
    # Exclusive version: last non-match column strictly before j.
    prev_false = jnp.concatenate(
        [
            jnp.full((match.shape[0], 1), -1, dtype=jnp.int32),
            last_false_incl[:, :-1],
        ],
        axis=1,
    )
    run_offset = iota - (prev_false + 1)
    return match & (run_offset % 2 == 0)


# Rows at least this wide compact via sort; narrower rows use the O(W^2)
# one-hot reduction, which is much faster for the short rows pre-tokens have.
_SORT_COMPACT_MIN_WIDTH = 96


def compact_rows(values: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Stably move kept entries to the front of each row; PAD the tail."""
    if values.shape[1] >= _SORT_COMPACT_MIN_WIDTH:
        return _compact_rows_sort(values, keep)
    return _compact_rows_onehot(values, keep)


def _compact_rows_onehot(values: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """O(W^2) branch-free compaction: dest one-hot + masked max-reduce.

    Each kept entry's destination column is its index minus the number of
    dropped entries before it; exactly one source maps to every destination
    column below the new length, so a masked maximum recovers the value
    (values are >= PAD = -1, and unmapped columns come out as PAD).
    """
    n, w = values.shape
    iota = jnp.arange(w, dtype=jnp.int32)
    dropped_before = jnp.cumsum((~keep).astype(jnp.int32), axis=1)
    dest = iota[None, :] - dropped_before
    onehot = keep[:, :, None] & (dest[:, :, None] == iota[None, None, :])
    return jnp.max(
        jnp.where(onehot, values[:, :, None], PAD), axis=1
    ).astype(values.dtype)


def _compact_rows_sort(values: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """O(W log W) compaction via a stable two-operand sort."""
    n, w = values.shape
    iota = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (n, w))
    keys = jnp.where(keep, iota, w + iota)
    _, sorted_vals = jax.lax.sort((keys, values), dimension=1, num_keys=1)
    new_len = jnp.sum(keep, axis=1, dtype=jnp.int32)[:, None]
    return jnp.where(iota < new_len, sorted_vals, PAD)


def apply_pair_merge(
    words: jnp.ndarray,
    left_sym: jnp.ndarray,
    right_sym: jnp.ndarray,
    new_sym: jnp.ndarray,
) -> jnp.ndarray:
    """Merge every leftmost-non-overlapping (left_sym, right_sym) occurrence.

    Args:
        words: int32 [N, W], -1 padded.
        left_sym/right_sym/new_sym: scalars (traced or concrete).

    Returns:
        Updated words, compacted, same shape.
    """
    l = words[:, :-1]
    r = words[:, 1:]
    match = (l == left_sym) & (r == right_sym) & (l >= 0)
    applied = leftmost_nonoverlapping(match)

    n = words.shape[0]
    false_col = jnp.zeros((n, 1), dtype=bool)
    applied_at = jnp.concatenate([applied, false_col], axis=1)  # merge starts
    removed_at = jnp.concatenate([false_col, applied], axis=1)  # right halves

    vals = jnp.where(applied_at, new_sym, words)
    keep = ~removed_at & (words >= 0)
    return compact_rows(vals, keep)


def apply_rowwise_merge(
    words: jnp.ndarray,
    applied: jnp.ndarray,
    new_syms: jnp.ndarray,
) -> jnp.ndarray:
    """Encoder variant: apply precomputed per-position merges.

    Args:
        words: int32 [N, W].
        applied: bool [N, W-1]; non-overlapping merge starts (per row).
        new_syms: int32 [N, W-1]; replacement symbol per applied position.
    """
    n = words.shape[0]
    false_col = jnp.zeros((n, 1), dtype=bool)
    applied_at = jnp.concatenate([applied, false_col], axis=1)
    removed_at = jnp.concatenate([false_col, applied], axis=1)
    new_full = jnp.concatenate(
        [new_syms, jnp.full((n, 1), PAD, dtype=words.dtype)], axis=1
    )
    vals = jnp.where(applied_at, new_full, words)
    keep = ~removed_at & (words >= 0)
    return compact_rows(vals, keep)


__all__ = [
    "leftmost_nonoverlapping",
    "compact_rows",
    "apply_pair_merge",
    "apply_rowwise_merge",
]
