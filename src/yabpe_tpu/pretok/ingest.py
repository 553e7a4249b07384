"""Parallel corpus ingestion: files -> pre-token frequency table.

Host-side layer feeding the device-resident trainer. Behavioral parity
target: /root/reference/src/yet_another_bpe/trainer.py:136-214, with one
TPU-first difference: instead of materializing every pre-token occurrence as
a list (ordered, memory-heavy), workers aggregate *frequency counters* of
unique pre-token byte strings. Pair counts are sums, so aggregation is
commutative and the result is independent of worker count and scheduling —
the property the reference only asserts via tests
(/root/reference/tests/test_trainer.py:148-165) holds here by construction.

The counter output feeds :class:`yabpe_tpu.core.wordtable.WordTable`, the
fixed-width padded array the device merge loop consumes.
"""

from __future__ import annotations

import os
from collections import Counter
from collections.abc import Sequence
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from pathlib import Path

from yabpe_tpu import native
from yabpe_tpu.pretok import chunking
from yabpe_tpu.pretok.patterns import compile_trainer_pattern


def _count_span(
    path: str,
    start: int,
    end: int,
    special_tokens: tuple[str, ...],
) -> Counter[bytes]:
    """Pre-tokenize one byte span and count unique pre-token byte strings."""
    data = chunking.read_span(path, start, end)
    text = chunking.decode_span_utf8(data, path, start)
    pattern = compile_trainer_pattern(special_tokens)
    # Counter(findall) counts in C; the utf-8 re-encode then runs once per
    # *unique* pre-token instead of once per occurrence.
    str_counts = Counter(pattern.findall(text))
    str_counts.pop("", None)
    return Counter({t.encode("utf-8"): c for t, c in str_counts.items()})


def _count_shard_native(
    shard: list[tuple[str, int, int]],
    specials: tuple[str, ...],
) -> native.NativeCounter:
    """Accumulate a whole span shard into ONE persistent counter.

    One counter per worker (not per span) means the Zipf head stays hot
    in the worker's table across spans and the final fold merges
    max_workers tables instead of one per chunk — at 1 GB that replaces
    ~34 counter builds + a tree of ~17+ merges with 2 builds + 1 merge.
    """
    counter = native.NativeCounter(specials)
    for path, start, end in shard:
        data = chunking.read_span(path, start, end)
        if native.utf8_invalid_at(data) >= 0:
            # Raise the reference-parity positioned ValueError.
            chunking.decode_span_utf8(data, path, start)
        counter.add(data)
    return counter


def _native_root_counter(
    tasks: list[tuple[str, int, int]],
    specials: tuple[str, ...],
    max_workers: int,
) -> native.NativeCounter:
    """Count all spans natively and fold into one counter.

    Spans are assigned to workers round-robin (deterministic), so the
    exported table order is run-to-run stable for a given worker count;
    the *counts* are worker-count invariant by commutativity either way.
    """
    # The native scan is CPU-bound with the GIL released; threads beyond
    # the physical cores only add contention.
    max_workers = min(max_workers, os.cpu_count() or 1, len(tasks))
    if max_workers <= 1:
        return _count_shard_native(tasks, specials)
    shards = [tasks[i::max_workers] for i in range(max_workers)]
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = [
            pool.submit(_count_shard_native, shard, specials)
            for shard in shards
        ]
        parts = [f.result() for f in futures]
    for part in parts[1:]:
        parts[0].merge(part)
        part.close()
    return parts[0]


def counter_from_raw(blob: bytes, lens, counts) -> Counter[bytes]:
    """Materialize a Counter from a raw exported word table."""
    total: Counter[bytes] = Counter()
    off = 0
    for length, count in zip(lens.tolist(), counts.tolist()):
        total[blob[off : off + length]] = count
        off += length
    total.pop(b"", None)
    return total


def _native_counts(
    tasks: list[tuple[str, int, int]],
    specials: tuple[str, ...],
    max_workers: int,
) -> Counter[bytes]:
    root = _native_root_counter(tasks, specials, max_workers)
    words, lens, counts = root.export()
    root.close()
    return counter_from_raw(words, lens, counts)


def count_pretokens_raw(
    files: Sequence[str | Path],
    special_tokens: Sequence[str],
    *,
    chunk_size_bytes: int = 8 * 1024 * 1024,
    max_workers: int = 8,
    align_to_newline: bool = False,
) -> tuple[bytes, "object", "object"] | None:
    """Native-only variant of :func:`count_pretokens` returning the raw
    exported word table (concatenated word bytes, int32 lengths, int64
    counts) without materializing Python byte strings — the zero-copy feed
    for the native merge loop. Returns None when the native scanner is
    unavailable.
    """
    if not native.available():
        return None
    specials = tuple(special_tokens)
    tasks: list[tuple[str, int, int]] = []
    for file in files:
        p = chunking.ensure_exists(file)
        for start, end in chunking.chunk_spans(
            p, chunk_size_bytes, align_to_newline=align_to_newline
        ):
            tasks.append((str(p), start, end))
    if not tasks:
        import numpy as np

        return b"", np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int64)
    root = _native_root_counter(tasks, specials, max_workers)
    words, lens, counts = root.export()
    root.close()
    return words, lens, counts


def count_pretokens(
    files: Sequence[str | Path],
    special_tokens: Sequence[str],
    *,
    chunk_size_bytes: int = 8 * 1024 * 1024,
    max_workers: int = 8,
    align_to_newline: bool = False,
    use_processes: bool | None = None,
) -> Counter[bytes]:
    """Count pre-token occurrences across ``files``.

    Args:
        files: UTF-8 text files. Raises FileNotFoundError on a missing file.
        special_tokens: matched as whole pre-tokens (trainer dialect).
        chunk_size_bytes: span size for parallel workers.
        max_workers: worker pool size.
        align_to_newline: end spans at newlines so pre-tokens never straddle
            spans (see chunking.chunk_spans). Off by default for parity.
        use_processes: use a process pool (beats the GIL for large corpora;
            the regex engine holds the GIL for most of a findall call).
            None = auto: processes when the corpus exceeds ~8 MB.

    Returns:
        Counter mapping pre-token UTF-8 bytes to occurrence count.
    """
    specials = tuple(special_tokens)
    tasks: list[tuple[str, int, int]] = []
    total_bytes = 0
    for file in files:
        p = chunking.ensure_exists(file)
        total_bytes += p.stat().st_size
        for start, end in chunking.chunk_spans(
            p, chunk_size_bytes, align_to_newline=align_to_newline
        ):
            tasks.append((str(p), start, end))

    total: Counter[bytes] = Counter()
    if not tasks:
        return total
    if native.available():
        return _native_counts(tasks, specials, max_workers)
    if max_workers <= 1 or len(tasks) == 1:
        for path, start, end in tasks:
            total.update(_count_span(path, start, end, specials))
        return total

    if use_processes is None:
        use_processes = total_bytes > 8 * 1024 * 1024
    pool_cls = ProcessPoolExecutor if use_processes else ThreadPoolExecutor
    with pool_cls(max_workers=max_workers) as pool:
        futures = [
            pool.submit(_count_span, path, start, end, specials)
            for path, start, end in tasks
        ]
        for fut in futures:
            total.update(fut.result())
    return total


__all__ = ["count_pretokens", "count_pretokens_raw"]
