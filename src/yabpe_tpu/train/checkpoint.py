"""Mid-training checkpoint / deterministic resume for the merge loop.

The reference persists only final models (/root/reference/src/
yet_another_bpe/trainer.py:94-117); mid-training state is lost on failure.
Because BPE training is fully deterministic and the merge record *is* the
entire training state, a checkpoint is just the [num_merges, 3] id record
plus a config fingerprint. Resume rebuilds the device state by replaying
the recorded merges onto the freshly ingested word table (a jitted scan
that skips all counting/argmax work) and continues from the next step.
"""

from __future__ import annotations

import json
import hashlib
import os
from dataclasses import asdict
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.core import lexkey
from yabpe_tpu.kernels.merge_apply import apply_pair_merge
from yabpe_tpu.train.state import TrainState, init_state


def config_fingerprint(config) -> str:
    """Hash of the semantically relevant trainer config fields."""
    fields = asdict(config)
    relevant = {
        k: fields[k]
        for k in ("vocab_size", "min_frequency", "special_tokens")
    }
    blob = json.dumps(relevant, sort_keys=True, default=list)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save_checkpoint(
    ckpt_dir: str | Path, merges_ids: np.ndarray, steps_done: int, config
) -> None:
    """Atomically persist the merge record (process 0 only in multi-host).

    Training is replicated-deterministic, so every process holds the same
    record; only process 0 writes to avoid interleaved writers on a shared
    filesystem. The tmp file carries the pid so a stray concurrent writer
    (e.g. two independent single-host runs pointed at one directory) can
    never interleave inside one file — ``replace`` keeps the final file
    atomic either way.
    """
    try:
        if jax.process_index() != 0:
            return
    except Exception:
        pass  # uninitialized distributed runtime == single process
    path = Path(ckpt_dir)
    path.mkdir(parents=True, exist_ok=True)
    tmp = path / f"merge_state.tmp.{os.getpid()}.npz"
    np.savez(tmp, merges=merges_ids, steps_done=np.int64(steps_done))
    tmp.replace(path / "merge_state.npz")
    meta = {
        "steps_done": steps_done,
        "fingerprint": config_fingerprint(config),
        "format": 1,
    }
    (path / "meta.json").write_text(json.dumps(meta))


def load_checkpoint(
    ckpt_dir: str | Path, config
) -> tuple[np.ndarray, int] | None:
    """Return (merges_ids, steps_done) or None when absent/incompatible."""
    path = Path(ckpt_dir)
    meta_file = path / "meta.json"
    state_file = path / "merge_state.npz"
    if not meta_file.exists() or not state_file.exists():
        return None
    try:
        meta = json.loads(meta_file.read_text())
        if meta.get("fingerprint") != config_fingerprint(config):
            return None
        data = np.load(state_file)
        return data["merges"], int(data["steps_done"])
    except (json.JSONDecodeError, OSError, ValueError, KeyError, EOFError):
        # A torn/corrupt checkpoint (e.g. killed mid-write before the
        # atomic replace, or a truncated npz) falls back to a fresh start
        # instead of crashing the resume path.
        return None


@partial(jax.jit, donate_argnums=(0,))
def _replay(words: jax.Array, records: jax.Array) -> jax.Array:
    """Apply a [k, 3] (left, right, new_sym) record to the word table."""

    def body(i, w):
        rec = records[i]
        do = rec[0] >= 0
        merged = apply_pair_merge(w, rec[0], rec[1], rec[2])
        return jnp.where(do, merged, w)

    return jax.lax.fori_loop(0, records.shape[0], body, words)


def resume_state(
    table: WordTable,
    base_vocab: Vocab,
    vocab_cap: int,
    num_merges: int,
    merges_ids: np.ndarray,
    steps_done: int,
) -> TrainState:
    """Rebuild device training state as of ``steps_done`` merges."""
    # Rebuild the grown vocabulary on the host (exactly as the device did).
    vocab = Vocab()
    for tok in base_vocab.tokens():
        vocab.add(tok)
    for left, right, new_sym in merges_ids[:steps_done]:
        if left < 0:
            break
        got = vocab.add(vocab.bytes_of(int(left)) + vocab.bytes_of(int(right)))
        assert got == int(new_sym), "checkpoint/vocab divergence"

    state = init_state(table, base_vocab, vocab_cap, num_merges)
    tokens = list(vocab.tokens())
    token_bytes, token_len = lexkey.initial_token_matrix(
        tokens, vocab_cap, int(state.token_bytes.shape[1])
    )
    lex_rank = lexkey.initial_lex_ranks(tokens, vocab_cap)

    records = jnp.asarray(merges_ids[:steps_done], dtype=jnp.int32)
    words = (
        _replay(state.words, records) if steps_done > 0 else state.words
    )

    merges = np.full_like(np.asarray(state.merges), -1)
    merges[:steps_done] = merges_ids[:steps_done]
    num_done = int((merges_ids[:steps_done, 0] >= 0).sum())

    return TrainState(
        words=words,
        freqs=state.freqs,
        token_bytes=jnp.asarray(token_bytes),
        token_len=jnp.asarray(token_len),
        lex_rank=jnp.asarray(lex_rank),
        next_id=jnp.asarray(len(tokens), dtype=jnp.int32),
        stopped=jnp.asarray(False),
        merges=jnp.asarray(merges),
        num_done=jnp.asarray(num_done, dtype=jnp.int32),
    )


__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "resume_state",
    "config_fingerprint",
]
