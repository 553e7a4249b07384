"""Device-resident training state and the jitted merge-loop step.

This is the TPU-native replacement for the reference's incremental Python
merge loop (/root/reference/src/yet_another_bpe/trainer.py:216-302). All
state lives on device in fixed-shape arrays; the host only reads back the
stop flag between chunks and the merge record at the end:

    words      [N, W]   padded unique-word symbol rows (mutated in place)
    freqs      [N]      word frequencies (constant)
    token_bytes[V, L]   byte string of every vocab id, -1 padded
    token_len  [V]
    lex_rank   [V]      dense lexicographic rank of live tokens (-1 inactive)
    next_id    scalar   vocab watermark
    stopped    scalar   min-frequency / exhaustion early stop
    merges     [M, 3]   (left, right, new_sym) per step, -1 rows after stop
    num_done   scalar

Each merge step recomputes pair counts from the word table (commutative
reduction -> shard-invariant), selects the best pair with exact byte-string
tie-breaking, maintains the token table (including the merged-bytes-already-
exist dedup branch, trainer.py:298-300), and applies the merge to all rows.
Steps run in chunks under one ``lax.fori_loop`` per jit call.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from yabpe_tpu.core import lexkey
from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.kernels.merge_apply import apply_pair_merge
from yabpe_tpu.kernels.pair_count import pair_counts_dense, pair_counts_matmul
from yabpe_tpu.kernels.select import select_best_pair


class TrainState(NamedTuple):
    words: jax.Array
    freqs: jax.Array
    token_bytes: jax.Array
    token_len: jax.Array
    lex_rank: jax.Array
    next_id: jax.Array
    stopped: jax.Array
    merges: jax.Array
    num_done: jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def init_state(
    table: WordTable,
    base_vocab: Vocab,
    vocab_cap: int,
    num_merges: int,
) -> TrainState:
    """Build the initial host-side state (numpy; jit moves it to device)."""
    if table.freqs.max(initial=0) > np.iinfo(np.int32).max:
        raise ValueError("word frequency exceeds int32; corpus too large for v0")
    base_tokens = list(base_vocab.tokens())
    byte_width = _round_up(
        max(table.width, base_vocab.max_token_len(), 2), 8
    )
    token_bytes, token_len = lexkey.initial_token_matrix(
        base_tokens, vocab_cap, byte_width
    )
    lex_rank = lexkey.initial_lex_ranks(base_tokens, vocab_cap)
    merges = np.full((max(num_merges, 1), 3), -1, dtype=np.int32)
    return TrainState(
        words=jnp.asarray(table.words),
        freqs=jnp.asarray(table.freqs.astype(np.int32)),
        token_bytes=jnp.asarray(token_bytes),
        token_len=jnp.asarray(token_len),
        lex_rank=jnp.asarray(lex_rank),
        next_id=jnp.asarray(len(base_tokens), dtype=jnp.int32),
        stopped=jnp.asarray(False),
        merges=jnp.asarray(merges),
        num_done=jnp.asarray(0, dtype=jnp.int32),
    )


def count_pairs(
    words: jax.Array, freqs: jax.Array, vocab_cap: int, strategy: str
) -> jax.Array:
    if strategy == "matmul":
        return pair_counts_matmul(words, freqs, vocab_cap)
    if strategy != "dense":
        raise ValueError(
            f"unknown count_strategy {strategy!r} (resolve 'auto' with "
            "resolve_count_strategy before tracing)"
        )
    return pair_counts_dense(words, freqs, vocab_cap)


#: No pair count can exceed the corpus's total adjacent-position weight, so
#: float32 one-hot matmul accumulation is exact strictly below this bound.
MATMUL_EXACT_BOUND = 2**24


def max_possible_pair_count(table: WordTable) -> int:
    """Upper bound on any pair count: sum of freq * (word_len - 1)."""
    lens = (table.words >= 0).sum(axis=1).astype(np.int64)
    return int(np.dot(np.maximum(lens - 1, 0), table.freqs.astype(np.int64)))


def resolve_count_strategy(
    requested: str, table: WordTable, vocab_cap: int, backend: str
) -> str:
    """Resolve the configured ``count_strategy`` to "dense" or "matmul".

    "auto" picks the MXU matmul formulation only where it is both exact
    (every possible count < 2**24) and profitable (small vocabularies on
    TPU — the matmul costs O(positions * V^2) flops, so it loses to the
    scatter past a few thousand symbols). An explicit "matmul" request is
    runtime-guarded: exactness is mandatory (golden-fixture parity), so a
    corpus that could overflow the f32 accumulation raises instead of
    silently corrupting counts.
    """
    if requested == "dense":
        return "dense"
    bound = max_possible_pair_count(table)
    exact = bound < MATMUL_EXACT_BOUND
    if requested == "matmul":
        if not exact:
            raise ValueError(
                f"count_strategy='matmul' is not exact for this corpus: the "
                f"pair-count bound {bound} reaches the f32 accumulation "
                f"limit {MATMUL_EXACT_BOUND}; use 'dense' or 'auto'"
            )
        return "matmul"
    if requested == "auto":
        profitable = backend == "tpu" and vocab_cap <= 2048
        return "matmul" if (exact and profitable) else "dense"
    raise ValueError(f"unknown count_strategy {requested!r}")


def merge_step(
    state: TrainState,
    step_index: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    count_strategy: str = "dense",
    in_range: jax.Array | bool = True,
) -> TrainState:
    """One BPE merge step (full recount + full-table select).

    The reference-shaped small-vocabulary path; the incremental, bigvocab
    and sharded engines select and update through their own persistent
    count structures. ``in_range=False`` makes the step a no-op (nothing
    written).
    """
    counts = count_pairs(state.words, state.freqs, vocab_cap, count_strategy)
    left, right, best_count = select_best_pair(counts, state.lex_rank, vocab_cap)

    stop_now = (
        (best_count < max(min_frequency, 1)) | (best_count <= 0)
    ) & in_range
    stopped = state.stopped | stop_now
    do = in_range & ~stopped

    state, new_sym = vocab_update(
        state, left, right, do, stopped, step_index, vocab_cap
    )

    new_words = apply_pair_merge(state.words, left, right, new_sym)
    words = jnp.where(do, new_words, state.words)
    return state._replace(words=words)


def vocab_update(
    state: TrainState,
    left: jax.Array,
    right: jax.Array,
    do: jax.Array,
    stopped: jax.Array,
    step_index: jax.Array,
    vocab_cap: int,
) -> tuple[TrainState, jax.Array]:
    """Token-table / lex-rank / merge-record maintenance for one step.

    Returns the updated state (words untouched) and the merged symbol id
    (the existing id when the merged bytes are already in the vocabulary —
    the dedup branch, trainer.py:298-300).
    """
    merged, merged_len = lexkey.concat_token_bytes(
        state.token_bytes, state.token_len, left, right
    )
    less, equal = lexkey.rows_vs_query(state.token_bytes, merged)
    active = jnp.arange(vocab_cap, dtype=jnp.int32) < state.next_id
    eq_active = equal & active
    exists = jnp.any(eq_active)
    existing_id = jnp.argmax(eq_active).astype(jnp.int32)
    new_sym = jnp.where(exists, existing_id, state.next_id)

    grow = do & ~exists
    bumped, insert_rank = lexkey.insert_lex_rank(state.lex_rank, active, less)
    lex_rank = jnp.where(
        grow, bumped.at[state.next_id].set(insert_rank), state.lex_rank
    )
    token_bytes = jnp.where(
        grow[None, None], state.token_bytes.at[state.next_id].set(merged),
        state.token_bytes,
    )
    token_len = jnp.where(
        grow, state.token_len.at[state.next_id].set(merged_len), state.token_len
    )
    next_id = state.next_id + grow.astype(jnp.int32)

    # Skipped steps write nothing (the record array is -1-initialized and
    # only ever appended to), so no-op steps cannot clobber earlier records
    # and callers need no full-state masking copy.
    record = jnp.stack([left, right, new_sym])
    write_idx = jnp.where(do, step_index, state.merges.shape[0])
    merges = state.merges.at[write_idx].set(record, mode="drop")
    num_done = state.num_done + do.astype(jnp.int32)

    return (
        state._replace(
            token_bytes=token_bytes,
            token_len=token_len,
            lex_rank=lex_rank,
            next_id=next_id,
            stopped=stopped,
            merges=merges,
            num_done=num_done,
        ),
        new_sym,
    )


@partial(
    jax.jit,
    static_argnames=(
        "vocab_cap",
        "min_frequency",
        "num_merges",
        "chunk_size",
        "count_strategy",
    ),
    donate_argnums=(0,),
)
def merge_chunk(
    state: TrainState,
    chunk_start: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    num_merges: int,
    chunk_size: int,
    count_strategy: str = "dense",
) -> TrainState:
    """Run up to ``chunk_size`` merge steps starting at ``chunk_start``.

    Steps past ``num_merges`` (or after early stop) are no-ops, so a single
    compiled chunk shape serves the whole loop.
    """

    def body(i, st):
        step = chunk_start + i
        return merge_step(
            st,
            jnp.minimum(step, num_merges - 1),
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            count_strategy=count_strategy,
            in_range=step < num_merges,
        )

    return jax.lax.fori_loop(0, chunk_size, body, state)


def merges_to_bytes(
    merges_ids: np.ndarray, base_vocab: Vocab
) -> tuple[Vocab, list[tuple[bytes, bytes]]]:
    """Convert the device merge record back to byte-string merges + vocab.

    Replays id-space merges on the host, growing a copy of the base vocab
    exactly as the device did (dedup included).
    """
    vocab = Vocab()
    for tok in base_vocab.tokens():
        vocab.add(tok)
    merges: list[tuple[bytes, bytes]] = []
    for left, right, new_sym in merges_ids:
        if left < 0:
            break
        lb = vocab.bytes_of(int(left))
        rb = vocab.bytes_of(int(right))
        got = vocab.add(lb + rb)
        if got != int(new_sym):
            raise AssertionError(
                f"host/device vocab divergence: merge {lb!r}+{rb!r} -> id {got} "
                f"on host but {int(new_sym)} on device"
            )
        merges.append((lb, rb))
    return vocab, merges


__all__ = [
    "TrainState",
    "init_state",
    "merge_step",
    "merge_chunk",
    "merges_to_bytes",
    "count_pairs",
    "resolve_count_strategy",
    "max_possible_pair_count",
    "MATMUL_EXACT_BOUND",
]
