"""Parallel whole-file encoding with pretoken-safe chunk boundaries.

The reference has no parallel file encode (its closest surface is the
serial ``encode`` driver, /root/reference/src/yet_another_bpe/
tokenizer.py:152-193, and the line-streamed ``encode_iterable`` adapter,
tests/adapters.py:30-34); this module adds the pod-scale path under the
same exactness contract: the result must be byte-identical to
``encode(whole_file)``.

Encoding must be byte-exact, so files can only be split where no GPT-2
pre-token can span the cut. A cut is safe exactly at a **non-whitespace →
whitespace transition** (the cut character is ``\\s``, the character before
it is not, per the ``regex`` engine's Unicode ``\\s``):

- No GPT-2 pre-token contains a non-ws→ws transition (`` ?\\p{L}+`` and
  friends attach at most a leading space and stop at whitespace; ``\\s+``
  variants are all-whitespace), so the transition is always a pre-token
  boundary in the whole text.
- The left chunk then ends at a non-whitespace character, whose final
  pre-token ends identically at end-of-buffer and mid-text.
- The right chunk starts with the *entire* whitespace run plus its
  following context, so the run tokenizes exactly as it does mid-text.

Cutting *inside* or at the *end* of a whitespace run is NOT safe:
``\\s+(?!\\S)`` tokenizes a run ending at end-of-buffer differently from the
same run mid-text (e.g. ``"x\\n\\n" + "line"`` encodes the ``\\n\\n`` as one
token, while the whole text splits it ``\\n`` + ``\\n``). Special tokens are
kept intact by only cutting outside any special-token occurrence. When no
safe transition exists near the target boundary the chunk is *extended
forward* to the next one (or to end-of-file) — exactness is never traded
for chunk-size regularity.

With the native runtime available, workers are THREADS: each gets its own
C encoder handle (built from shared read-only tables) and the ctypes call
releases the GIL, so spans encode on real cores with no process spin-up or
pickling. The process pool remains for the pure-Python fallback.
"""

from __future__ import annotations

import os
import re
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from pathlib import Path

import numpy as np
import regex

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


# Whitespace classification must agree with the pre-tokenizer's engine:
# the `regex` module's Unicode \s is the single source of truth (the native
# scanner is fuzz-verified against it).
_WS_RE = regex.compile(r"\s")
_ASCII_WS = frozenset(
    i for i in range(128) if _WS_RE.fullmatch(chr(i)) is not None
)
_SCAN_WINDOW = 65536

# Byte-level candidate prefilter: a safe cut's character is whitespace, so
# it starts with an ASCII whitespace byte or a UTF-8 lead byte (\xc2-\xf4,
# for the non-ASCII whitespace code points). Scanning windows with this
# compiled class runs at C speed, so whitespace-free regions (base64
# blobs, minified text, DNA strings) skip in one pass instead of a Python
# call per byte.
_CUT_CANDIDATE = re.compile(
    b"[" + bytes(sorted(_ASCII_WS)) + b"\xc2-\xf4]"
)


def _char_len(b0: int) -> int:
    """UTF-8 sequence length implied by a lead byte (0 for continuations)."""
    if b0 < 0x80:
        return 1
    if b0 < 0xC0:
        return 0
    if b0 < 0xE0:
        return 2
    if b0 < 0xF0:
        return 3
    return 4


def _is_ws_at(buf: bytes, r: int) -> bool | None:
    """Whitespace-ness of the character starting at ``buf[r]``.

    Returns None when ``r`` is not a character start or the character is
    truncated/malformed (such positions are never safe cuts).
    """
    b0 = buf[r]
    if b0 < 0x80:
        return b0 in _ASCII_WS
    n = _char_len(b0)
    if n == 0 or r + n > len(buf):
        return None
    try:
        ch = buf[r : r + n].decode("utf-8")
    except UnicodeDecodeError:
        return None
    return _WS_RE.fullmatch(ch) is not None


def _prev_is_nonws(buf: bytes, r: int) -> bool:
    """True iff a complete non-whitespace character ends at ``buf[r-1]``."""
    s = r - 1
    lim = max(0, r - 4)
    while s >= lim and (buf[s] & 0xC0) == 0x80:
        s -= 1
    if s < 0:
        return False
    n = _char_len(buf[s])
    if n == 0 or s + n != r:
        return False
    return _is_ws_at(buf, s) is False


def _is_safe_cut(buf: bytes, r: int, specials: list[bytes]) -> bool:
    return (
        _is_ws_at(buf, r) is True
        and _prev_is_nonws(buf, r)
        and not _inside_special(buf, r, specials)
    )


def safe_cut_points(
    path: str | Path,
    target_chunk: int,
    special_tokens: list[str],
) -> list[tuple[int, int]]:
    """Byte spans whose boundaries no pre-token or special can span.

    See the module docstring for the safety argument: every cut sits on a
    non-ws→ws character transition outside special-token occurrences, and
    chunks are extended forward when no such transition exists near the
    target boundary, so ``concat(encode(span))`` is always byte-identical
    to ``encode(whole_file)``.
    """
    path = Path(path)
    size = path.stat().st_size
    if size <= target_chunk:
        return [(0, size)] if size else []

    specials = [s.encode("utf-8") for s in special_tokens]
    # Context margin: enough bytes beyond a candidate to decode the cut
    # character (<=4 bytes) and to detect a straddling special occurrence.
    margin = max(4, max((len(s) for s in specials), default=0))

    spans: list[tuple[int, int]] = []
    with open(path, "rb") as f:
        start = 0
        while start < size:
            tentative = min(start + target_chunk, size)
            if tentative >= size:
                spans.append((start, size))
                break
            cut = _find_safe_cut(f, start, tentative, size, specials, margin)
            if cut is None:
                spans.append((start, size))
                break
            spans.append((start, cut))
            start = cut
    return spans


def _find_safe_cut(
    f,
    start: int,
    tentative: int,
    size: int,
    specials: list[bytes],
    margin: int,
) -> int | None:
    """Largest safe cut in (start, tentative], else the smallest one past
    ``tentative`` (forward extension), else None (rest of file is one span).
    """
    win_lo = max(start + 1, tentative - _SCAN_WINDOW)
    buf_lo = max(0, win_lo - margin)
    f.seek(buf_lo)
    buf = f.read(min(tentative + margin, size) - buf_lo)
    candidates = [
        m.start()
        for m in _CUT_CANDIDATE.finditer(
            buf, win_lo - buf_lo, tentative - buf_lo + 1
        )
    ]
    for r in reversed(candidates):
        if _is_safe_cut(buf, r, specials):
            return buf_lo + r
    pos = tentative + 1
    while pos < size:
        win_hi = min(size, pos + _SCAN_WINDOW)
        buf_lo = max(0, pos - margin)
        f.seek(buf_lo)
        buf = f.read(min(win_hi + margin, size) - buf_lo)
        for m in _CUT_CANDIDATE.finditer(buf, pos - buf_lo, win_hi - buf_lo):
            if _is_safe_cut(buf, m.start(), specials):
                return buf_lo + m.start()
        pos = win_hi
    return None


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
    encoder_pool: list | None = None,
) -> np.ndarray:
    """Encode a whole file exactly, fanned out over worker threads (native)
    or a process pool (pure-Python fallback). ``symbol_tables`` optionally
    carries the caller's precomputed (live, out_ids) extended-symbol
    tables so repeated calls skip rebuilding them; ``encoder_pool`` an
    :class:`EncoderPool` whose native encoders' word caches stay warm
    across calls (see _encode_spans_threaded). No process-wide allocator
    tuning happens here — per the package policy (yabpe_tpu/__init__.py),
    library APIs must not impose hostmem.tune_malloc on the host app;
    bulk CLI/benchmark entry points opt in themselves."""
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
            symbol_tables, encoder_pool,
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


class EncoderPool:
    """Persistent native encoders whose word caches stay warm across
    encode_file calls — without one, every call re-pays the corpus's
    unique-word BPE cost.

    The pool is bound to one (live, out_ids) symbol-table pair (checked
    by identity on every claim — reusing a pool with different
    vocab/merges would silently encode with the wrong ranks). ``claim``
    hands the WHOLE pool to exactly one encode_file call at a time;
    a concurrent call on the same pool finds it empty and builds its own
    transient encoders, so native handles are never shared across
    threads mid-call.
    """

    def __init__(self) -> None:
        import threading

        self._encoders: list = []
        self._tables: tuple | None = None
        self._lock = threading.Lock()

    def __len__(self) -> int:
        with self._lock:
            return len(self._encoders)

    def claim(self, live, out_ids) -> list:
        with self._lock:
            if self._tables is None:
                self._tables = (live, out_ids)
            elif (
                self._tables[0] is not live or self._tables[1] is not out_ids
            ):
                raise ValueError(
                    "EncoderPool is bound to different symbol tables; use a "
                    "fresh pool per (vocab, merges)"
                )
            claimed, self._encoders = self._encoders, []
            return claimed

    def release(self, encoders: list) -> None:
        with self._lock:
            self._encoders.extend(encoders)

    def clear_caches(self) -> None:
        with self._lock:
            for enc in self._encoders:
                enc.cache_clear()


def _encode_spans_threaded(
    path: Path,
    spans: list[tuple[int, int]],
    vocab: dict[bytes, int],
    merges: list[tuple[bytes, bytes]],
    special_tokens: list[str],
    max_workers: int,
    symbol_tables=None,
    encoder_pool: "EncoderPool | None" = None,
) -> np.ndarray:
    """Thread fan-out with one native encoder handle per worker.

    With ``encoder_pool``, worker threads claim persistent encoders by
    index (growing the claimed list on demand); they are released back
    to the pool afterwards, not closed.
    """
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
    owned: list[native.NativeEncoder] = []
    claimed = (
        encoder_pool.claim(live, out_ids) if encoder_pool is not None else []
    )
    enc_lock = threading.Lock()
    next_idx = [0]

    def encoder() -> native.NativeEncoder:
        e = getattr(local, "enc", None)
        if e is None:
            with enc_lock:
                if encoder_pool is not None:
                    i = next_idx[0]
                    next_idx[0] += 1
                    while len(claimed) <= i:
                        claimed.append(native.NativeEncoder(live, out_ids))
                    e = claimed[i]
                else:
                    e = native.NativeEncoder(live, out_ids)
                    owned.append(e)
            local.enc = e
        return e

    def work(span: tuple[int, int]) -> np.ndarray:
        data = chunking.read_span(path, span[0], span[1])
        bad = native.utf8_invalid_at(data)
        if bad >= 0:
            chunking.decode_span_utf8(data, path, span[0])
        return encoder().encode_text(data, sp_bytes, sp_ids)

    workers = min(max_workers, os.cpu_count() or 1)
    try:
        if workers <= 1 or len(spans) == 1:
            parts = [work(sp) for sp in spans]
        else:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                parts = list(pool.map(work, spans))
    finally:
        for e in owned:
            e.close()
        if encoder_pool is not None:
            encoder_pool.release(claimed)
    return np.concatenate(parts)


__all__ = ["encode_file_parallel", "safe_cut_points"]
