"""ctypes bindings for the native (C++) pre-tokenizer runtime.

The native library implements the hot host-side path — GPT-2 pre-token
scanning and word-frequency aggregation (the reference's regex-findall +
Counter pipeline, /root/reference/src/yet_another_bpe/trainer.py:162-213 and
tokenizer.py:184-190) — in C++ at ~20x regex throughput. It is built on
first use with g++ (sources in native/), and everything degrades gracefully
to the pure-Python regex path when a compiler is unavailable:
call :func:`available` before using the fast paths.

ctypes releases the GIL for the duration of each native call, so the
ingest layer's thread pool gets true host-core parallelism here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[3]
_NATIVE_DIR = _REPO / "native"
_SO_PATH = _NATIVE_DIR / "build" / "libyabpe_native.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> bool:
    src = _NATIVE_DIR / "yabpe_native.cpp"
    tables = _NATIVE_DIR / "unicode_tables.h"
    if not src.exists():
        return False
    try:
        if not tables.exists():
            subprocess.run(
                [sys.executable, str(_NATIVE_DIR / "gen_tables.py")],
                check=True,
                capture_output=True,
            )
        _SO_PATH.parent.mkdir(parents=True, exist_ok=True)
        tmp = _SO_PATH.with_suffix(f".tmp{os.getpid()}.so")
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                "-o",
                str(tmp),
                str(src),
            ],
            check=True,
            capture_output=True,
        )
        tmp.replace(_SO_PATH)  # atomic: concurrent builders race safely
        return True
    except (subprocess.CalledProcessError, OSError):
        return False


def _stale() -> bool:
    try:
        so_mtime = _SO_PATH.stat().st_mtime
        return any(
            p.stat().st_mtime > so_mtime
            for p in (_NATIVE_DIR / "yabpe_native.cpp", _NATIVE_DIR / "gen_tables.py")
            if p.exists()
        )
    except OSError:
        return True


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("YABPE_NO_NATIVE"):
            _load_failed = True
            return None
        so_path = os.environ.get("YABPE_NATIVE_SO")  # debug/ASan override
        if not so_path:
            if _stale() and not _build():
                _load_failed = True
                return None
            so_path = str(_SO_PATH)
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            _load_failed = True
            return None

        lib.yabpe_pretok_offsets.restype = ctypes.c_int64
        lib.yabpe_pretok_offsets.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.yabpe_utf8_validate.restype = ctypes.c_int64
        lib.yabpe_utf8_validate.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.yabpe_pretok_word_ids.restype = ctypes.c_int64
        lib.yabpe_pretok_word_ids.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.yabpe_pretok_word_ids_specials.restype = ctypes.c_int64
        lib.yabpe_pretok_word_ids_specials.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.yabpe_find_specials.restype = ctypes.c_int64
        lib.yabpe_find_specials.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.yabpe_counter_new.restype = ctypes.c_void_p
        lib.yabpe_counter_new.argtypes = []
        lib.yabpe_counter_free.restype = None
        lib.yabpe_counter_free.argtypes = [ctypes.c_void_p]
        lib.yabpe_counter_add.restype = None
        lib.yabpe_counter_add.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.yabpe_counter_add_table.restype = None
        lib.yabpe_counter_add_table.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.yabpe_counter_merge.restype = None
        lib.yabpe_counter_merge.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.yabpe_counter_unique.restype = ctypes.c_int64
        lib.yabpe_counter_unique.argtypes = [ctypes.c_void_p]
        lib.yabpe_counter_total_bytes.restype = ctypes.c_int64
        lib.yabpe_counter_total_bytes.argtypes = [ctypes.c_void_p]
        lib.yabpe_counter_export.restype = None
        lib.yabpe_counter_export.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.yabpe_encoder_new.restype = ctypes.c_void_p
        lib.yabpe_encoder_new.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.yabpe_encoder_free.restype = None
        lib.yabpe_encoder_free.argtypes = [ctypes.c_void_p]
        lib.yabpe_encode_text.restype = ctypes.c_int64
        lib.yabpe_encode_text.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.yabpe_encode_segment.restype = ctypes.c_int64
        lib.yabpe_encode_segment.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.yabpe_encoder_cache_info.restype = None
        lib.yabpe_encoder_cache_info.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.yabpe_encoder_cache_clear.restype = None
        lib.yabpe_encoder_cache_clear.argtypes = [ctypes.c_void_p]
        lib.yabpe_train.restype = ctypes.c_void_p
        lib.yabpe_train.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int64,
        ]
        lib.yabpe_train_num_merges.restype = ctypes.c_int32
        lib.yabpe_train_num_merges.argtypes = [ctypes.c_void_p]
        lib.yabpe_train_merges.restype = None
        lib.yabpe_train_merges.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.yabpe_train_num_syms.restype = ctypes.c_int32
        lib.yabpe_train_num_syms.argtypes = [ctypes.c_void_p]
        lib.yabpe_train_syms_total_bytes.restype = ctypes.c_int64
        lib.yabpe_train_syms_total_bytes.argtypes = [ctypes.c_void_p]
        lib.yabpe_train_export_syms.restype = None
        lib.yabpe_train_export_syms.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.yabpe_train_free.restype = None
        lib.yabpe_train_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is built and loadable."""
    return _load() is not None


def utf8_invalid_at(data: bytes) -> int:
    """Byte offset of the first invalid UTF-8 sequence, or -1 if valid.

    Matches CPython's strict decoder acceptance (surrogates, overlongs,
    truncation and > U+10FFFF all rejected).
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    return int(lib.yabpe_utf8_validate(data, len(data)))


def pretok_offsets(data: bytes) -> np.ndarray:
    """Token end byte-offsets of ``data`` under the GPT-2 split pattern.

    ``data`` must be valid UTF-8 (no special tokens — tokenizer dialect).
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(data)
    # Tokens are >=1 byte, so n offsets always suffice.
    ends = np.empty(max(n, 1), dtype=np.int32)
    count = lib.yabpe_pretok_offsets(
        data, n, ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n
    )
    return ends[:count]


def find_specials(
    data: bytes, specials_longest_first: list[bytes]
) -> tuple[np.ndarray, np.ndarray]:
    """Non-overlapping special-token occurrences (tokenizer dialect).

    ``specials_longest_first`` must be sorted longest-first. Returns
    (start offsets int64, special indices int32) in document order.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    sp = specials_longest_first
    blob = b"".join(sp)
    lens = (ctypes.c_int32 * max(len(sp), 1))(*[len(b) for b in sp])
    min_len = min((len(b) for b in sp if b), default=1)
    cap = len(data) // max(min_len, 1) + 1
    starts = np.empty(cap, dtype=np.int64)
    ids = np.empty(cap, dtype=np.int32)
    count = lib.yabpe_find_specials(
        data,
        len(data),
        blob,
        lens,
        len(sp),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap,
    )
    return starts[:count], ids[:count]


def train_host(
    word_counts: dict[bytes, int],
    num_merges: int,
    min_frequency: int,
) -> list[tuple[bytes, bytes]]:
    """Run the native host BPE merge loop (small-workload path).

    Exact reference-semantics merge loop (argmax with lexicographically
    greatest tie-break, leftmost merge scan, dedup branch); bit-identical
    to the device loop. Returns the learned merges as byte-string pairs.
    """
    items = [(w, c) for w, c in word_counts.items() if c > 0 and len(w) > 0]
    blob = b"".join(w for w, _ in items)
    lens = np.array([len(w) for w, _ in items], dtype=np.int32)
    counts = np.array([c for _, c in items], dtype=np.int64)
    return train_host_raw(blob, lens, counts, num_merges, min_frequency)


def train_host_raw(
    blob: bytes,
    lens: np.ndarray,
    counts: np.ndarray,
    num_merges: int,
    min_frequency: int,
) -> list[tuple[bytes, bytes]]:
    """:func:`train_host` over a raw exported word table (no dict)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n = len(lens)
    handle = lib.yabpe_train(
        blob,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        num_merges,
        min_frequency,
    )
    try:
        n_merges = lib.yabpe_train_num_merges(handle)
        merges = np.empty((max(n_merges, 1), 2), dtype=np.int32)
        lib.yabpe_train_merges(
            handle, merges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        n_syms = lib.yabpe_train_num_syms(handle)
        total = lib.yabpe_train_syms_total_bytes(handle)
        sym_blob = ctypes.create_string_buffer(max(int(total), 1))
        sym_lens = np.empty(max(n_syms, 1), dtype=np.int32)
        lib.yabpe_train_export_syms(
            handle,
            sym_blob,
            sym_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    finally:
        lib.yabpe_train_free(handle)
    syms: list[bytes] = []
    off = 0
    raw = sym_blob.raw
    for length in sym_lens[:n_syms].tolist():
        syms.append(raw[off : off + length])
        off += length
    return [
        (syms[left], syms[right]) for left, right in merges[:n_merges].tolist()
    ]


class NativeEncoder:
    """Per-word BPE encoder handle (extended-symbol space, cached)."""

    def __init__(
        self,
        live: dict[tuple[int, int], tuple[int, int]],
        out_ids: np.ndarray,
    ) -> None:
        lib = _load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        keys = np.array(
            [(np.uint64(sl) << np.uint64(32)) | np.uint64(sr) for sl, sr in live],
            dtype=np.uint64,
        )
        ranks = np.array([r for r, _ in live.values()], dtype=np.int32)
        news = np.array([s for _, s in live.values()], dtype=np.int32)
        out32 = np.ascontiguousarray(out_ids, dtype=np.int32)
        self._h: int | None = lib.yabpe_encoder_new(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ranks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            news.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(keys),
            out32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(out32),
        )
        self._specials_cache: dict = {}

    def _prepared_specials(
        self, special_bytes: list[bytes], special_ids: list[int]
    ):
        """Cache the per-call-constant ctypes argument block, keyed by the
        list *values* (so fresh-but-equal lists hit the cache, and a caller
        mutating a list in place never gets a stale block)."""
        key = (tuple(special_bytes), tuple(special_ids))
        prep = self._specials_cache.get(key)
        if prep is None:
            n_sp = len(special_bytes)
            sp_blob = b"".join(special_bytes)
            sp_lens = (ctypes.c_int32 * max(n_sp, 1))(
                *[len(b) for b in special_bytes]
            )
            sp_ids = (ctypes.c_int32 * max(n_sp, 1))(
                *[i if i is not None else -1 for i in special_ids]
            )
            prep = (sp_blob, sp_lens, sp_ids, n_sp)
            if len(self._specials_cache) >= 64:
                self._specials_cache.clear()
            self._specials_cache[key] = prep
        return prep

    def encode_text(
        self,
        data: bytes,
        special_bytes: list[bytes],
        special_ids: list[int],
    ) -> np.ndarray:
        """Split on specials (longest-first order expected) and encode the
        whole text in one native pass. ``special_ids[i]`` is the vocab id
        written for ``special_bytes[i]`` (-1 drops it)."""
        assert self._h is not None
        n = len(data)
        out = np.empty(max(n + 1, 1), dtype=np.int32)
        sp_blob, sp_lens, sp_ids, n_sp = self._prepared_specials(
            special_bytes, special_ids
        )
        count = self._lib.yabpe_encode_text(
            self._h,
            data,
            n,
            sp_blob,
            sp_lens,
            sp_ids,
            n_sp,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(out),
        )
        return out[:count]

    def encode_segment(self, data: bytes) -> np.ndarray:
        """Pre-tokenize + BPE-encode a special-free UTF-8 segment."""
        assert self._h is not None
        n = len(data)
        out = np.empty(max(n, 1), dtype=np.int32)
        count = self._lib.yabpe_encode_segment(
            self._h,
            data,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
        )
        return out[:count]

    def cache_info(self) -> tuple[int, int, int]:
        """(hits, misses, cached words)."""
        assert self._h is not None
        hits = ctypes.c_int64()
        misses = ctypes.c_int64()
        size = ctypes.c_int64()
        self._lib.yabpe_encoder_cache_info(
            self._h,
            ctypes.byref(hits),
            ctypes.byref(misses),
            ctypes.byref(size),
        )
        return hits.value, misses.value, size.value

    def cache_clear(self) -> None:
        assert self._h is not None
        self._lib.yabpe_encoder_cache_clear(self._h)

    def close(self) -> None:
        if self._h is not None:
            self._lib.yabpe_encoder_free(self._h)
            self._h = None

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:
            pass


class NativeCounter:
    """Word-frequency counter handle over the native scanner."""

    def __init__(self, special_tokens: tuple[str, ...] = ()) -> None:
        lib = _load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self._h: int | None = lib.yabpe_counter_new()
        sp = [t.encode("utf-8") for t in special_tokens]
        self._special_bytes = b"".join(sp)
        self._special_lens = (ctypes.c_int32 * max(len(sp), 1))(
            *[len(b) for b in sp]
        )
        self._n_specials = len(sp)

    def add(self, data: bytes) -> None:
        """Pre-tokenize valid-UTF-8 ``data`` and accumulate counts."""
        assert self._h is not None
        self._lib.yabpe_counter_add(
            self._h,
            data,
            len(data),
            self._special_bytes,
            self._special_lens,
            self._n_specials,
        )

    def add_word_ids(self, data: bytes) -> np.ndarray:
        """Pre-tokenize ``data`` (no specials) and return per-occurrence
        unique-word ids, registering new words in this counter."""
        assert self._h is not None
        n = len(data)
        out = np.empty(max(n, 1), dtype=np.int32)
        count = self._lib.yabpe_pretok_word_ids(
            self._h,
            data,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
        )
        return out[:count]

    def add_word_ids_specials(self, data: bytes) -> np.ndarray:
        """Tokenizer-dialect pre-tokenize ``data`` with this counter's
        special tokens in one native pass: returns per-element ids where a
        pre-token occurrence yields its unique-word id (registered here)
        and a special occurrence yields ``-(1 + special_index)`` (index
        into the constructor's longest-first special ordering)."""
        assert self._h is not None
        n = len(data)
        out = np.empty(max(n, 1), dtype=np.int32)
        count = self._lib.yabpe_pretok_word_ids_specials(
            self._h,
            data,
            n,
            self._special_bytes,
            self._special_lens,
            self._n_specials,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
        )
        return out[:count]

    def export_words(self) -> list[bytes]:
        """Unique words as a list of bytes, in insertion (id) order."""
        words, lens, _ = self.export()
        out: list[bytes] = []
        off = 0
        for length in lens.tolist():
            out.append(words[off : off + length])
            off += length
        return out

    def add_table(self, blob: bytes, lens: np.ndarray, counts: np.ndarray) -> None:
        """Fold a raw exported word table (e.g. from another host) in."""
        assert self._h is not None
        lens = np.ascontiguousarray(lens, dtype=np.int32)
        counts = np.ascontiguousarray(counts, dtype=np.int64)
        self._lib.yabpe_counter_add_table(
            self._h,
            blob,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(lens),
        )

    def merge(self, other: "NativeCounter") -> None:
        assert self._h is not None and other._h is not None
        self._lib.yabpe_counter_merge(self._h, other._h)

    def export(self) -> tuple[bytes, np.ndarray, np.ndarray]:
        """(concatenated word bytes, lengths int32, counts int64)."""
        assert self._h is not None
        n = self._lib.yabpe_counter_unique(self._h)
        total = self._lib.yabpe_counter_total_bytes(self._h)
        words = ctypes.create_string_buffer(max(int(total), 1))
        lens = np.empty(max(int(n), 1), dtype=np.int32)
        counts = np.empty(max(int(n), 1), dtype=np.int64)
        self._lib.yabpe_counter_export(
            self._h,
            words,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return words.raw[: int(total)], lens[: int(n)], counts[: int(n)]

    def close(self) -> None:
        if self._h is not None:
            self._lib.yabpe_counter_free(self._h)
            self._h = None

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:
            pass


__all__ = ["available", "pretok_offsets", "NativeCounter"]
