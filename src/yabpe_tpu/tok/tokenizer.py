"""Byte-level BPE tokenizer: encode/decode with a trained or loaded model.

Public-surface parity target: /root/reference/src/yet_another_bpe/
tokenizer.py (BBPETokenizer: encode/decode/encode_batch/decode_batch/
from_file/vocab_size/special_tokens/get_vocab/clear_cache/cache_info).

The per-word encoder uses the *batch-merge* formulation: repeatedly find the
lowest-rank adjacent pair present in the word, then merge every leftmost-
non-overlapping occurrence of that one pair, and repeat. This is provably
equivalent to the reference's one-occurrence-at-a-time heap algorithm
(tokenizer.py:195-308): a merge of pair (u, v) can only create pairs
containing the merged token, whose merges were necessarily learned *after*
(u, v) and therefore rank strictly higher — so every remaining (u, v)
occurrence is consumed before any newly created pair, and batching them is
order-safe. The same formulation is what the vectorized device encoder
(yabpe_tpu.tok.device_encode) runs over padded tiles.

Word-level results are LRU-cached; batch APIs can route through the jitted
device encoder for throughput.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Sequence
from functools import lru_cache
from pathlib import Path

from yabpe_tpu import native
from yabpe_tpu.io.native import load_model
from yabpe_tpu.pretok.patterns import (
    compile_gpt2_pattern,
    compile_special_splitter,
)

_CACHE_SIZE = 8192


class BBPETokenizer:
    """Byte-level BPE tokenizer."""

    def __init__(
        self,
        vocab: dict[bytes, int] | None = None,
        merges: list[tuple[bytes, bytes]] | None = None,
        special_tokens: list[str] | None = None,
    ) -> None:
        self._vocab: dict[bytes, int] = vocab or {}
        self._vocab_inv: dict[int, bytes] = {v: k for k, v in self._vocab.items()}
        self._merges: list[tuple[bytes, bytes]] = merges or []
        self._special_tokens: list[str] = special_tokens or []
        self._special_set: frozenset[str] = frozenset(self._special_tokens)

        self._merge_ranks: dict[tuple[bytes, bytes], int] = {
            pair: rank for rank, pair in enumerate(self._merges)
        }
        self._pattern = compile_gpt2_pattern()
        self._special_pattern = compile_special_splitter(self._special_tokens)
        self._specials_longest_first_bytes = [
            s.encode("utf-8")
            for s in sorted(self._special_tokens, key=len, reverse=True)
        ]
        self._unk_id: int = self._vocab.get(b"[UNK]", 0)
        self._specials_vocab_ids = [
            self._vocab.get(b, -1)
            for b in self._specials_longest_first_bytes
        ]

        self._encode_word_cached = lru_cache(maxsize=_CACHE_SIZE)(
            self._encode_word_impl
        )
        # Short-text result cache: the reference's per-word LRU gives it
        # ~2 us warm single-word encode; the native one-pass call costs
        # ~8 us of fixed dispatch, so small repeated texts are served from
        # here (fresh list per call, tuples cached).
        self._encode_short_cached = lru_cache(maxsize=_CACHE_SIZE)(
            self._encode_short_impl
        )
        # built lazily by encode_batch(device=True), keyed by shard count
        self._device_encoder: dict[int, object] = {}
        self._native_encoder = None  # built lazily by encode()
        # Persistent native encoders for encode_file worker threads: word
        # caches stay warm across calls (built lazily, freed with self).
        self._file_encoder_pool = None
        self._symbol_tables_cache = None

    @classmethod
    def from_file(cls, model_dir: str | Path) -> "BBPETokenizer":
        """Load a tokenizer from a native-dialect model directory."""
        vocab, merges, special_tokens = load_model(model_dir)
        return cls(vocab=vocab, merges=merges, special_tokens=special_tokens)

    @classmethod
    def from_gpt2_files(
        cls,
        vocab_json: str | Path,
        merges_txt: str | Path,
        special_tokens: list[str] | None = None,
    ) -> "BBPETokenizer":
        """Load GPT-2-dialect files (printable-unicode remap) natively.

        Accepts the published ``vocab.json``/``merges.txt`` format (e.g. the
        official GPT-2 release); see yabpe_tpu.io.gpt2.
        """
        from yabpe_tpu.io import gpt2 as gpt2io

        vocab = gpt2io.load_gpt2_vocab(vocab_json)
        merges = gpt2io.load_gpt2_merges(merges_txt)
        if special_tokens is None:
            special_tokens = (
                ["<|endoftext|>"] if b"<|endoftext|>" in vocab else []
            )
        return cls(vocab=vocab, merges=merges, special_tokens=special_tokens)

    # ------------------------------------------------------------------ encode

    def encode(self, text: str) -> list[int]:
        """Encode text into token ids."""
        if not text:
            return []
        out: list[int] = []
        if native.available():
            # Fully bytes-native path: one C pass does the special-token
            # split (tokenizer dialect, longest-first), pre-tokenization,
            # and per-word BPE, writing vocab ids into a single array.
            if len(text) <= 64:
                return list(self._encode_short_cached(text))
            ids = self._get_native_encoder().encode_text(
                text.encode("utf-8"),
                self._specials_longest_first_bytes,
                self._specials_vocab_ids,
            )
            return ids.tolist()
        elif self._special_pattern is not None:
            for part in self._special_pattern.split(text):
                if not part:
                    continue
                if part in self._special_set:
                    sid = self._vocab.get(part.encode("utf-8"))
                    if sid is not None:
                        out.append(sid)
                else:
                    self._encode_plain(part, out)
        else:
            self._encode_plain(text, out)
        return out

    def _encode_short_impl(self, text: str) -> tuple[int, ...]:
        ids = self._get_native_encoder().encode_text(
            text.encode("utf-8"),
            self._specials_longest_first_bytes,
            self._specials_vocab_ids,
        )
        return tuple(ids.tolist())

    def _encode_plain(self, text: str, out: list[int]) -> None:
        """Pure-Python fallback (native unavailable): regex pre-tokenize +
        cached per-word batch-merge scan."""
        cached = self._encode_word_cached
        for word in self._pattern.findall(text):
            out.extend(cached(word))

    def _symbol_tables(self):
        if self._symbol_tables_cache is None:
            from yabpe_tpu.tok.symbols import extended_symbol_tables

            _, live, out_ids = extended_symbol_tables(
                self._vocab, self._merges, self._unk_id
            )
            self._symbol_tables_cache = (live, out_ids)
        return self._symbol_tables_cache

    def _get_native_encoder(self):
        if self._native_encoder is None:
            live, out_ids = self._symbol_tables()
            self._native_encoder = native.NativeEncoder(live, out_ids)
        return self._native_encoder

    def _encode_word_impl(self, word: str) -> tuple[int, ...]:
        """BPE-encode one pre-token (batch-merge formulation, see module doc)."""
        return self._encode_bytes_impl(word.encode("utf-8"))

    def _encode_bytes_impl(self, data: bytes) -> tuple[int, ...]:
        if not data:
            return ()
        vocab = self._vocab
        if len(data) == 1:
            return (vocab.get(data, self._unk_id),)

        ranks = self._merge_ranks
        syms: list[bytes] = [data[i : i + 1] for i in range(len(data))]
        while len(syms) > 1:
            best_rank: int | None = None
            best_pair: tuple[bytes, bytes] | None = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_pair = (syms[i], syms[i + 1])
            if best_pair is None:
                break
            merged = best_pair[0] + best_pair[1]
            new_syms: list[bytes] = []
            i = 0
            n = len(syms)
            while i < n:
                if (
                    i + 1 < n
                    and syms[i] == best_pair[0]
                    and syms[i + 1] == best_pair[1]
                ):
                    new_syms.append(merged)
                    i += 2
                else:
                    new_syms.append(syms[i])
                    i += 1
            syms = new_syms

        unk = self._unk_id
        return tuple(vocab.get(s, unk) for s in syms)

    def encode_batch(
        self,
        texts: Sequence[str],
        *,
        device: bool = False,
        data_shards: int | None = None,
    ) -> list[list[int]]:
        """Encode multiple texts.

        With ``device=True``, pre-tokens from all texts are packed into
        padded tiles and encoded by the jitted merge-rank scan kernel;
        ``data_shards`` additionally shards tile rows over a ``data`` mesh
        of that many devices.
        """
        if device:
            encoder = self._get_device_encoder(data_shards)
            if encoder is not None:
                return encoder.encode_batch(texts)
        return [self.encode(t) for t in texts]

    def encode_iterable(self, iterable: Iterable[str]) -> Iterator[int]:
        """Stream token ids for an iterable of text pieces (bounded memory)."""
        for piece in iterable:
            yield from self.encode(piece)

    def encode_file(
        self,
        path,
        *,
        max_workers: int | None = None,
        chunk_bytes: int = 4 * 1024 * 1024,
        device: bool = False,
    ):
        """Encode a whole file exactly, parallelized over a process pool.

        Files are split only at pretoken-safe boundaries (see
        yabpe_tpu.tok.parallel_encode), so the result is byte-identical to
        ``encode(file_contents)``. Returns an int32 numpy array.

        ``device=True`` runs the unique-word scans on the accelerator
        instead: chunk i's tiles execute while the host pre-tokenizes
        chunk i+1, and the device word cache persists across calls.
        """
        if device and native.available():
            encoder = self._get_device_encoder(None)
            if encoder is not None:
                return encoder.encode_file(path, chunk_bytes=chunk_bytes)
        from yabpe_tpu.tok.parallel_encode import (
            EncoderPool,
            encode_file_parallel,
        )

        tables = self._symbol_tables() if native.available() else None
        if self._file_encoder_pool is None:
            self._file_encoder_pool = EncoderPool()
        return encode_file_parallel(
            path,
            self._vocab,
            self._merges,
            self._special_tokens,
            max_workers=max_workers,
            chunk_bytes=chunk_bytes,
            symbol_tables=tables,
            encoder_pool=self._file_encoder_pool,
        )

    def _get_device_encoder(self, data_shards: int | None = None):
        """Build (and cache) the device encoder for a shard count.

        Returns None — also cached, so the symbol tables are never rebuilt
        just to fail again — when the extended symbol table exceeds the
        device kernel's packed uint32 pair-key range (>65535 symbols); the
        caller serves such batches from the host path.
        """
        key = data_shards or 1
        if key not in self._device_encoder:
            from yabpe_tpu.tok.device_encode import (
                DeviceEncoder,
                SymbolTableTooLarge,
            )

            try:
                self._device_encoder[key] = DeviceEncoder(
                    vocab=self._vocab,
                    merges=self._merges,
                    special_tokens=self._special_tokens,
                    data_shards=data_shards,
                )
            except SymbolTableTooLarge:
                # Only the oversize case falls back; anything else (e.g. a
                # mis-configured mesh) propagates to the caller.
                from yabpe_tpu.utils.logging import get_logger

                get_logger(__name__).warning(
                    "vocab too large for the device encoder; "
                    "encode_batch(device=True) will use the host path"
                )
                self._device_encoder[key] = None
        return self._device_encoder[key]

    # ------------------------------------------------------------------ decode

    def decode(self, ids: Sequence[int]) -> str:
        """Decode token ids back to text (unknown ids are skipped)."""
        if not ids:
            return ""
        inv = self._vocab_inv
        data = b"".join(inv[i] for i in ids if i in inv)
        return data.decode("utf-8", errors="replace")

    def decode_batch(self, ids_batch: Sequence[Sequence[int]]) -> list[str]:
        return [self.decode(ids) for ids in ids_batch]

    # ------------------------------------------------------------- introspection

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    @property
    def special_tokens(self) -> list[str]:
        return self._special_tokens.copy()

    def get_vocab(self) -> dict[str, int]:
        return {k.decode("latin-1"): v for k, v in self._vocab.items()}

    def clear_cache(self) -> None:
        self._encode_word_cached.cache_clear()
        self._encode_short_cached.cache_clear()
        if self._native_encoder is not None:
            self._native_encoder.cache_clear()
        if self._file_encoder_pool is not None:
            self._file_encoder_pool.clear_caches()

    def cache_info(self) -> str:
        info = self._encode_word_cached.cache_info()
        hits, misses, size = info.hits, info.misses, info.currsize
        if self._native_encoder is not None:
            n_hits, n_misses, n_size = self._native_encoder.cache_info()
            hits += n_hits
            misses += n_misses
            size += n_size
        return f"hits={hits}, misses={misses}, size={size}/{info.maxsize}"


__all__ = ["BBPETokenizer"]
