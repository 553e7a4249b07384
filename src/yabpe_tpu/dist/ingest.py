"""Multi-host corpus ingestion: per-host shards → global word table.

The north-star layout (BASELINE.json) shards the corpus data-parallel
across hosts. Each host ingests its file shard with the local parallel
pipeline (yabpe_tpu.pretok.ingest), then the per-host word-frequency
tables are exchanged with a device all-gather and unioned on every host.
Counts are commutative integers, so the global table is bitwise host-count
invariant — the same property the single-host ingest gives for worker
counts, lifted across the DCN.

The reference has no multi-host anything (its only parallelism is a thread
pool, /root/reference/src/yet_another_bpe/trainer.py:201-213); this module
is the cross-host layer the TPU design adds. On a single process it
degenerates to the local pipeline with zero copies.
"""

from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path

import numpy as np

from yabpe_tpu import native
from yabpe_tpu.pretok import ingest as local_ingest


def shard_files(
    files: Sequence[str | Path], process_index: int, process_count: int
) -> list[str | Path]:
    """Round-robin file assignment for this host (deterministic)."""
    return [f for i, f in enumerate(files) if i % process_count == process_index]


def _allgather_table(
    blob: bytes, lens: np.ndarray, counts: np.ndarray
) -> list[tuple[bytes, np.ndarray, np.ndarray]]:
    """Exchange raw word tables across hosts (padded device all-gather)."""
    import jax
    from jax.experimental import multihost_utils

    # Ragged across hosts: gather sizes first, then ONE packed payload
    # (lens | counts | blob as raw bytes) padded to the global max — a
    # single collective instead of one per field.
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    payload = lens.tobytes() + counts.tobytes() + blob
    sizes = np.array([len(blob), len(lens), len(payload)], dtype=np.int64)
    all_sizes = np.asarray(multihost_utils.process_allgather(sizes))
    max_payload = int(all_sizes[:, 2].max())

    packed = np.zeros(max_payload, dtype=np.uint8)
    packed[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    all_packed = np.asarray(multihost_utils.process_allgather(packed))

    out = []
    for p in range(jax.process_count()):
        nb, nw = int(all_sizes[p, 0]), int(all_sizes[p, 1])
        raw = all_packed[p]
        lens_p = np.frombuffer(raw[: 4 * nw].tobytes(), dtype=np.int32)
        counts_p = np.frombuffer(raw[4 * nw : 12 * nw].tobytes(), dtype=np.int64)
        blob_p = raw[12 * nw : 12 * nw + nb].tobytes()
        out.append((blob_p, lens_p, counts_p))
    return out


def count_pretokens_global(
    files: Sequence[str | Path],
    special_tokens: Sequence[str],
    *,
    chunk_size_bytes: int = 32 * 1024 * 1024,
    max_workers: int = 8,
    align_to_newline: bool = True,
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Globally-unioned raw word table over all hosts' file shards.

    Every host passes the SAME full ``files`` list; each ingests only its
    round-robin shard, and the returned (blob, lens int32, counts int64)
    table is identical on every host (first-occurrence order of the
    process-0-major concatenation, so downstream training is deterministic).
    """
    import jax

    p_idx, p_cnt = jax.process_index(), jax.process_count()
    mine = shard_files(files, p_idx, p_cnt)
    local = local_ingest.count_pretokens_raw(
        mine,
        special_tokens,
        chunk_size_bytes=chunk_size_bytes,
        max_workers=max_workers,
        align_to_newline=align_to_newline,
    )
    if local is None:
        raise RuntimeError("native scanner unavailable")
    if p_cnt == 1:
        return local

    tables = _allgather_table(*local)
    root = native.NativeCounter()
    for blob, lens, counts in tables:  # process-0-major: deterministic
        root.add_table(blob, lens, counts)
    words, lens, counts = root.export()
    root.close()
    return words, lens, counts


__all__ = ["count_pretokens_global", "shard_files"]
