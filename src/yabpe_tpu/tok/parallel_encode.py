"""Parallel whole-file encoding with pretoken-safe chunk boundaries.

Encoding must be byte-exact, so files can only be split where no GPT-2
pre-token can span the cut. A safe cut point is right after a ``\\n`` that is
followed by a character that is neither whitespace nor the ASCII space: the
whitespace run ends at the newline (only a single literal space can attach
to a following word under `` ?\\p{L}+``-style branches), so both sides
pre-tokenize independently to the same tokens. Special tokens are also kept
intact by only cutting outside any special-token occurrence.

With the native runtime available, workers are THREADS: each gets its own
C encoder handle (built from shared read-only tables) and the ctypes call
releases the GIL, so spans encode on real cores with no process spin-up or
pickling. The process pool remains for the pure-Python fallback.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from pathlib import Path

import numpy as np

from yabpe_tpu import native
from yabpe_tpu.pretok import chunking

_WORKER_TOK = None


def _init_worker(vocab, merges, special_tokens):
    global _WORKER_TOK
    from yabpe_tpu.tok.tokenizer import BBPETokenizer

    _WORKER_TOK = BBPETokenizer(
        vocab=vocab, merges=merges, special_tokens=special_tokens
    )


def _encode_span(path: str, start: int, end: int) -> np.ndarray:
    data = chunking.read_span(path, start, end)
    text = chunking.decode_span_utf8(data, path, start)
    return np.asarray(_WORKER_TOK.encode(text), dtype=np.int32)


def safe_cut_points(
    path: str | Path,
    target_chunk: int,
    special_tokens: list[str],
) -> list[tuple[int, int]]:
    """Byte spans whose boundaries no pre-token or special can span."""
    path = Path(path)
    size = path.stat().st_size
    if size <= target_chunk:
        return [(0, size)] if size else []

    specials = [s.encode("utf-8") for s in special_tokens]
    max_special = max((len(s) for s in specials), default=0)

    spans: list[tuple[int, int]] = []
    with open(path, "rb") as f:
        start = 0
        while start < size:
            tentative = min(start + target_chunk, size)
            if tentative >= size:
                spans.append((start, size))
                break
            # Search a window around the tentative cut for "\n" + non-ws.
            win_lo = max(start, tentative - 65536)
            f.seek(win_lo)
            window = f.read(min(tentative - win_lo + max_special + 4, size - win_lo))
            cut = -1
            rel_limit = tentative - win_lo
            pos = rel_limit
            while pos > 0:
                nl = window.rfind(b"\n", 0, pos)
                if nl < 0 or nl + 1 >= len(window):
                    break
                nxt = window[nl + 1]
                if nxt not in b" \t\r\n\x0b\x0c":
                    candidate = win_lo + nl + 1
                    if not _inside_special(window, nl + 1, specials):
                        cut = candidate
                        break
                pos = nl
            if cut <= start:
                # No safe cut found in the window: grow the chunk.
                start_next = tentative
                # fall back to UTF-8-safe cut (exactness only guaranteed for
                # corpora with newlines; practically always present).
                spans.append((start, tentative))
                start = start_next
                continue
            spans.append((start, cut))
            start = cut
    return spans


def _inside_special(window: bytes, pos: int, specials: list[bytes]) -> bool:
    for sp in specials:
        lo = max(0, pos - len(sp) + 1)
        seg = window[lo : pos + len(sp) - 1]
        if sp in seg:
            return True
    return False


def encode_file_parallel(
    path: str | Path,
    vocab: dict[bytes, int],
    merges: list[tuple[bytes, bytes]],
    special_tokens: list[str],
    *,
    max_workers: int | None = None,
    chunk_bytes: int = 4 * 1024 * 1024,
    symbol_tables=None,
) -> np.ndarray:
    """Encode a whole file exactly, fanned out over worker threads (native)
    or a process pool (pure-Python fallback). ``symbol_tables`` optionally
    carries the caller's precomputed (live, out_ids) extended-symbol
    tables so repeated calls skip rebuilding them."""
    path = Path(path)
    chunking.ensure_exists(path)
    spans = safe_cut_points(path, chunk_bytes, special_tokens)
    if not spans:
        return np.zeros((0,), dtype=np.int32)
    if max_workers is None:
        max_workers = min(os.cpu_count() or 1, 16)

    if native.available():
        return _encode_spans_threaded(
            path, spans, vocab, merges, special_tokens, max_workers,
            symbol_tables,
        )

    # Pure-Python fallback: process pool beats the GIL-bound regex engine.
    if max_workers <= 1 or len(spans) < 4:
        _init_worker(vocab, merges, special_tokens)
        parts = [_encode_span(str(path), s, e) for s, e in spans]
        return np.concatenate(parts)
    with ProcessPoolExecutor(
        max_workers=max_workers,
        initializer=_init_worker,
        initargs=(vocab, merges, special_tokens),
    ) as pool:
        futures = [
            pool.submit(_encode_span, str(path), s, e) for s, e in spans
        ]
        return np.concatenate([f.result() for f in futures])


def _encode_spans_threaded(
    path: Path,
    spans: list[tuple[int, int]],
    vocab: dict[bytes, int],
    merges: list[tuple[bytes, bytes]],
    special_tokens: list[str],
    max_workers: int,
    symbol_tables=None,
) -> np.ndarray:
    """Thread fan-out with one native encoder handle per worker."""
    import threading

    if symbol_tables is not None:
        live, out_ids = symbol_tables
    else:
        from yabpe_tpu.tok.symbols import extended_symbol_tables

        unk_id = vocab.get(b"[UNK]", 0)
        _, live, out_ids = extended_symbol_tables(vocab, merges, unk_id)
    sp_bytes = [
        s.encode("utf-8")
        for s in sorted(special_tokens, key=len, reverse=True)
    ]
    sp_ids = [vocab.get(b, -1) for b in sp_bytes]

    local = threading.local()
    encoders: list[native.NativeEncoder] = []
    enc_lock = threading.Lock()

    def encoder() -> native.NativeEncoder:
        e = getattr(local, "enc", None)
        if e is None:
            e = native.NativeEncoder(live, out_ids)
            local.enc = e
            with enc_lock:
                encoders.append(e)
        return e

    def work(span: tuple[int, int]) -> np.ndarray:
        data = chunking.read_span(path, span[0], span[1])
        bad = native.utf8_invalid_at(data)
        if bad >= 0:
            chunking.decode_span_utf8(data, path, span[0])
        return encoder().encode_text(data, sp_bytes, sp_ids)

    workers = min(max_workers, os.cpu_count() or 1)
    if workers <= 1 or len(spans) == 1:
        parts = [work(sp) for sp in spans]
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            parts = list(pool.map(work, spans))
    for e in encoders:
        e.close()
    return np.concatenate(parts)


__all__ = ["encode_file_parallel", "safe_cut_points"]
