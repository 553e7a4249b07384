"""Driver for the fused Pallas merge-loop kernel.

Packs TrainState into the kernel's VMEM-resident layout, runs chunks, and
unpacks the merge record. Applicability is gated by a VMEM budget estimate;
callers fall back to the XLA incremental path when it does not fit.
Behavioral parity target: the reference merge loop
(/root/reference/src/yet_another_bpe/trainer.py:216-302) — same argmax
tie-break, min_frequency stop, leftmost merge scan, and dedup branch,
pinned by the golden fixtures in tests/test_fused_kernel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.kernels.fused_loop import fused_merge_chunk
from yabpe_tpu.train import state as train_state
from yabpe_tpu.train.incremental import init_counts

# Conservative VMEM budget for state + step temporaries (limit is 100 MB).
_VMEM_BUDGET = 48 * 1024 * 1024


def fused_applicable(num_rows: int, width: int, vocab_cap: int, byte_width: int) -> bool:
    words = num_rows * width * 4
    counts = vocab_cap * vocab_cap * 4
    token_bytes = vocab_cap * byte_width * 4
    # one-hot gather/scatter temporaries: ~4 copies of [A=64, N] + [N, W]
    temps = 4 * 64 * num_rows * 4 + 4 * words + 8 * counts
    return words + counts + token_bytes + temps < _VMEM_BUDGET


def run_fused_merge_loop(
    table: WordTable,
    base_vocab: Vocab,
    *,
    vocab_cap: int,
    num_merges: int,
    min_frequency: int,
    chunk_size: int = 256,
    batch_rows: int = 64,
    interpret: bool = False,
) -> np.ndarray:
    """Run the merge loop with the fused kernel; returns [num_merges, 3]."""
    st = train_state.init_state(table, base_vocab, vocab_cap, num_merges)
    counts = init_counts(st.words, st.freqs, vocab_cap=vocab_cap).reshape(
        vocab_cap, vocab_cap
    )
    words = st.words
    token_bytes = st.token_bytes
    token_len = st.token_len.reshape(1, -1)
    lex_rank = st.lex_rank.reshape(1, -1)
    merges = jnp.full((max(num_merges, 1), 4), -1, jnp.int32)
    freqs = st.freqs.reshape(1, -1)
    scalars = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(st.next_id)

    chunk = max(1, min(chunk_size, num_merges))
    start = 0
    while start < num_merges:
        scalars = scalars.at[0, 3].set(start)
        (words, counts, token_bytes, token_len, lex_rank, merges,
         scalars) = fused_merge_chunk(
            words, counts, token_bytes, token_len, lex_rank, merges,
            scalars, freqs,
            vocab_cap=vocab_cap,
            num_merges=num_merges,
            chunk_size=chunk,
            min_frequency=min_frequency,
            batch_rows=batch_rows,
            interpret=interpret,
        )
        start += chunk
        if int(scalars[0, 1]) != 0:  # stopped
            break
    rec = np.asarray(merges)[:, :3]
    return rec


__all__ = ["run_fused_merge_loop", "fused_applicable"]
