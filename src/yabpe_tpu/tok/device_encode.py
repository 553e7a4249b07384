"""Batched device encoder: vectorized merge-rank scan over padded word tiles.

TPU-native replacement for the reference's per-word heap encoder
(/root/reference/src/yet_another_bpe/tokenizer.py:195-308). Pre-tokens are
packed into a [rows, width] int32 tile of symbol ids; each scan iteration
finds, per row, the lowest-rank adjacent pair (via binary search over the
packed pair-key table), merges every leftmost-non-overlapping occurrence,
and compacts the row — equivalence to the heap argued in
yabpe_tpu.tok.tokenizer's module docstring.

Symbols live in an *extended* table independent of the output vocabulary:
ids 0..255 are the single bytes, and each live merge appends (or reuses)
the id of its concatenation, so merges whose product is absent from the
vocab still apply and only the final id lookup falls back to [UNK] — the
reference's exact behavior (tokenizer.py:296-308). Duplicate merge pairs
keep the *last* rank, matching the reference's dict construction
(tokenizer.py:74-76).

Pair keys are packed as uint32 = left * n_syms + right, which caps the
symbol table at 65535 entries (GPT-2's 50,256 fits).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yabpe_tpu.core.wordtable import PAD
from yabpe_tpu.kernels.merge_apply import (
    apply_rowwise_merge,
    leftmost_nonoverlapping,
)
from yabpe_tpu import native
from yabpe_tpu.pretok.patterns import (
    compile_gpt2_pattern,
    compile_special_splitter,
)

_NO_RANK = np.int32(2**30)


class SymbolTableTooLarge(ValueError):
    """The extended symbol table exceeds the packed uint32 pair-key range."""


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scan_encode_impl(
    words: jax.Array,
    sorted_keys: jax.Array,
    sorted_ranks: jax.Array,
    sorted_new_syms: jax.Array,
    n_syms: jax.Array,
) -> jax.Array:
    """Run merge-rank scan iterations until no row has a mergeable pair."""
    num_keys = sorted_keys.shape[0]

    def lookup(left: jax.Array, right: jax.Array, valid: jax.Array):
        key = (
            left.astype(jnp.uint32) * n_syms.astype(jnp.uint32)
            + right.astype(jnp.uint32)
        )
        pos = jnp.searchsorted(sorted_keys, key)
        pos_c = jnp.minimum(pos, num_keys - 1)
        found = valid & (pos < num_keys) & (sorted_keys[pos_c] == key)
        rank = jnp.where(found, sorted_ranks[pos_c], _NO_RANK)
        new_sym = sorted_new_syms[pos_c]
        return rank, new_sym

    def has_work(words: jax.Array) -> jax.Array:
        left = words[:, :-1]
        right = words[:, 1:]
        valid = (left >= 0) & (right >= 0)
        rank, _ = lookup(left, right, valid)
        return jnp.any(rank < _NO_RANK)

    def body(words: jax.Array) -> jax.Array:
        left = words[:, :-1]
        right = words[:, 1:]
        valid = (left >= 0) & (right >= 0)
        rank, new_sym = lookup(left, right, valid)
        row_min = jnp.min(rank, axis=1, keepdims=True)
        match = (rank == row_min) & (rank < _NO_RANK)
        applied = leftmost_nonoverlapping(match)
        return apply_rowwise_merge(words, applied, new_sym)

    return jax.lax.while_loop(has_work, body, words)


_scan_encode = partial(jax.jit, donate_argnums=(0,))(_scan_encode_impl)


def _build_sharded_scan(mesh):
    """Shard tile rows over the mesh's ``data`` axis; merge tables are
    replicated. Rows are independent, so each shard runs its own scan
    while_loop to completion with no cross-device sync per iteration."""
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        _scan_encode_impl,
        mesh=mesh,
        in_specs=(P("data", None), P(), P(), P(), P()),
        out_specs=P("data", None),
    )
    return jax.jit(fn)


class DeviceEncoder:
    """Packs pre-tokens into tiles and encodes them with the scan kernel."""

    def __init__(
        self,
        vocab: dict[bytes, int],
        merges: list[tuple[bytes, bytes]],
        special_tokens: list[str] | None = None,
        *,
        max_rows: int = 8192,
        data_shards: int | None = None,
    ) -> None:
        """``data_shards``: shard encode tiles row-wise over a ``data``
        mesh of that many devices (pod-scale batched encode); None/1 =
        single device."""
        self._vocab = vocab
        self._sharded_scan = None
        if data_shards and data_shards > 1:
            from yabpe_tpu.dist.mesh import make_data_mesh

            self._mesh = make_data_mesh(data_shards)
            self._sharded_scan = _build_sharded_scan(self._mesh)
            if max_rows % data_shards:
                max_rows = _round_up(max_rows, data_shards)
        self._data_shards = data_shards or 1
        self._special_tokens = special_tokens or []
        self._special_set = frozenset(self._special_tokens)
        self._pattern = compile_gpt2_pattern()
        self._special_pattern = compile_special_splitter(self._special_tokens)
        self._unk_id = vocab.get(b"[UNK]", 0)
        self._max_rows = max_rows
        self._word_cache: dict[str, tuple[int, ...]] = {}
        self._word_cache_b: dict[bytes, tuple[int, ...]] = {}

        # Extended symbol table: single bytes + live merge products
        # (shared construction, yabpe_tpu.tok.symbols).
        from yabpe_tpu.tok.symbols import extended_symbol_tables

        sym_bytes, live, out_ids = extended_symbol_tables(
            vocab, merges, self._unk_id
        )
        n_syms = len(sym_bytes)
        if n_syms > 0xFFFF:
            raise SymbolTableTooLarge(
                f"extended symbol table has {n_syms} entries; uint32 pair "
                "keys support at most 65535"
            )
        self._n_syms = n_syms

        if live:
            packed = sorted(
                (np.uint32(sl) * np.uint32(n_syms) + np.uint32(sr), rank, st)
                for (sl, sr), (rank, st) in live.items()
            )
            self._sorted_keys = jnp.asarray(
                np.array([k for k, _, _ in packed], dtype=np.uint32)
            )
            self._sorted_ranks = jnp.asarray(
                np.array([r for _, r, _ in packed], dtype=np.int32)
            )
            self._sorted_new_syms = jnp.asarray(
                np.array([s for _, _, s in packed], dtype=np.int32)
            )
        else:
            self._sorted_keys = jnp.zeros((1,), dtype=jnp.uint32)
            self._sorted_ranks = jnp.full((1,), _NO_RANK, dtype=jnp.int32)
            self._sorted_new_syms = jnp.zeros((1,), dtype=jnp.int32)

        self._out_ids = out_ids
        self._n_syms_dev = jnp.asarray(n_syms, dtype=jnp.uint32)

    # ------------------------------------------------------------------ public

    def encode_batch(self, texts: Sequence[str]) -> list[list[int]]:
        """Encode texts; all new pre-tokens cross the device in one tile set.

        When the native scanner is available the whole host side runs
        vectorized: per-occurrence unique-word ids from the C++ scanner, one
        device pass over new unique words, then a single numpy gather per
        text — no per-token Python objects.
        """
        if native.available():
            return self._encode_batch_native(texts)
        parts_per_text = [self._split(t) for t in texts]
        new_words: list[str] = []
        seen: set[str] = set()
        for parts in parts_per_text:
            for is_special, piece in parts:
                if not is_special and piece not in self._word_cache:
                    if piece not in seen:
                        seen.add(piece)
                        new_words.append(piece)
        if new_words:
            self._encode_words(new_words)

        out: list[list[int]] = []
        for parts in parts_per_text:
            ids: list[int] = []
            for is_special, piece in parts:
                if is_special:
                    sid = self._vocab.get(piece.encode("utf-8"))
                    if sid is not None:
                        ids.append(sid)
                else:
                    ids.extend(self._word_cache[piece])
            out.append(ids)
        return out

    def encode_file(
        self, path, *, chunk_bytes: int = 4 * 1024 * 1024
    ) -> np.ndarray:
        """Encode a whole file exactly through the device scan kernel.

        Pipelined: the native pre-tokenization of chunk i+1 runs on the
        host WHILE the device executes chunk i's dispatched tiles (JAX
        dispatch is async), and the unique-word device cache persists
        across chunks AND across calls (a warm second file pays no device
        work for words already seen). Chunks split only at pretoken-safe
        boundaries (yabpe_tpu.tok.parallel_encode.safe_cut_points), so
        the output is byte-identical to ``encode(file_contents)``
        (/root/reference/src/yet_another_bpe/tokenizer.py encode
        semantics). Requires the native scanner.
        """
        if not native.available():
            raise RuntimeError(
                "device encode_file requires the native scanner"
            )
        from yabpe_tpu.tok.parallel_encode import safe_cut_points

        spans = safe_cut_points(path, chunk_bytes, self._special_tokens)
        specials_sorted = sorted(
            self._special_tokens, key=len, reverse=True
        )
        sp_ids = [
            self._vocab.get(s.encode("utf-8")) for s in specials_sorted
        ]
        cache = self._word_cache_b
        results: list[np.ndarray] = []
        prev = None  # (occ, uniq, new_words, pending_tiles)
        with open(path, "rb") as f:
            for start, end in spans:
                f.seek(start)
                data = f.read(end - start)
                counter = native.NativeCounter(tuple(specials_sorted))
                occ = counter.add_word_ids_specials(data)
                uniq = counter.export_words()
                counter.close()
                new = [w for w in uniq if w not in cache]
                pending = self._dispatch_word_rows(new)
                if prev is not None:
                    # chunk i-1's tiles computed during our host scan;
                    # this readback mostly finds them finished
                    results.append(self._finish_chunk(*prev, sp_ids))
                prev = (occ, uniq, new, pending)
        if prev is not None:
            results.append(self._finish_chunk(*prev, sp_ids))
        if not results:
            return np.empty(0, dtype=np.int32)
        return np.concatenate(results)

    def _finish_chunk(self, occ, uniq, new, pending, sp_ids) -> np.ndarray:
        cache = self._word_cache_b
        for enc, word in zip(
            self._collect_word_rows(len(new), pending), new
        ):
            cache[word] = enc
        return self._occ_to_ids(occ, uniq, sp_ids)

    def _occ_to_ids(self, occ, uniq, sp_ids) -> np.ndarray:
        """Expand occurrence ids to token ids via the byte-word cache
        (one flat table + one segment-gather; no per-token Python)."""
        cache = self._word_cache_b
        encodings = [cache[w] for w in uniq]
        encodings.extend(
            (sid,) if sid is not None else () for sid in sp_ids
        )
        n_uniq = len(uniq)
        lens = np.array([len(e) for e in encodings], dtype=np.int64)
        starts = np.zeros(len(encodings), dtype=np.int64)
        if len(encodings):
            np.cumsum(lens[:-1], out=starts[1:])
        flat = np.empty(int(lens.sum()), dtype=np.int32)
        for s, enc in zip(starts.tolist(), encodings):
            flat[s : s + len(enc)] = enc
        if not len(occ):
            return np.empty(0, dtype=np.int32)
        occ = np.where(occ >= 0, occ, n_uniq + (-occ - 1))
        length = lens[occ]
        csum = np.cumsum(length)
        total = int(csum[-1]) if len(csum) else 0
        idx = np.arange(total, dtype=np.int64) + np.repeat(
            starts[occ] - (csum - length), length
        )
        return flat[idx]

    def _encode_batch_native(self, texts: Sequence[str]) -> list[list[int]]:
        # One native pass per text: unique-word ids per pre-token occurrence,
        # -(1+special_index) per special occurrence (tokenizer dialect,
        # longest-first — tokenizer.py:100-102 semantics).
        specials_sorted = sorted(self._special_tokens, key=len, reverse=True)
        counter = native.NativeCounter(tuple(specials_sorted))
        sp_ids = [
            self._vocab.get(s.encode("utf-8")) for s in specials_sorted
        ]
        occs = [
            counter.add_word_ids_specials(text.encode("utf-8"))
            if text
            else np.empty(0, dtype=np.int32)
            for text in texts
        ]

        uniq = counter.export_words()
        counter.close()
        cache = self._word_cache_b
        new = [w for w in uniq if w not in cache]
        if new:
            for enc, word in zip(self._encode_word_rows(new), new):
                cache[word] = enc

        # Flat encoding table: unique words first, then one pseudo-word per
        # special (its vocab id, or empty when the special isn't in the
        # vocab — the reference drops such specials, tokenizer.py:177-181).
        encodings = [cache[w] for w in uniq]
        encodings.extend(
            (sid,) if sid is not None else () for sid in sp_ids
        )
        n_uniq = len(uniq)
        lens = np.array([len(e) for e in encodings], dtype=np.int64)
        starts = np.zeros(len(encodings), dtype=np.int64)
        if len(encodings):
            np.cumsum(lens[:-1], out=starts[1:])
        flat = np.empty(int(lens.sum()), dtype=np.int32)
        for s, enc in zip(starts.tolist(), encodings):
            flat[s : s + len(enc)] = enc

        out: list[list[int]] = []
        for occ in occs:
            if not len(occ):
                out.append([])
                continue
            # Map special sentinels onto their pseudo-word rows, then do a
            # single segment-gather over the flat table for the whole text.
            occ = np.where(occ >= 0, occ, n_uniq + (-occ - 1))
            length = lens[occ]
            csum = np.cumsum(length)
            total = int(csum[-1])
            idx = np.arange(total, dtype=np.int64) + np.repeat(
                starts[occ] - (csum - length), length
            )
            out.append(flat[idx].tolist())
        return out

    # ----------------------------------------------------------------- helpers

    def _split(self, text: str) -> list[tuple[bool, str]]:
        """Split text into (is_special, piece) with piece a pre-token."""
        parts: list[tuple[bool, str]] = []
        if not text:
            return parts
        if self._special_pattern is not None:
            for part in self._special_pattern.split(text):
                if not part:
                    continue
                if part in self._special_set:
                    parts.append((True, part))
                else:
                    parts.extend((False, w) for w in self._pattern.findall(part))
        else:
            parts.extend((False, w) for w in self._pattern.findall(text))
        return parts

    def _encode_words(self, words: list[str]) -> None:
        """Encode unique pre-tokens on device and fill the word cache."""
        encoded = [w.encode("utf-8") for w in words]
        for name, ids in zip(words, self._encode_word_rows(encoded)):
            self._word_cache[name] = ids

    def _encode_word_rows(
        self, encoded: list[bytes]
    ) -> list[tuple[int, ...]]:
        """Encode unique pre-token byte strings via the device kernel.

        Words are sorted by length before batching so that long outliers
        cluster into one tile instead of inflating every batch's width,
        and both tile dimensions are bucketed to powers of two — the whole
        workload compiles a couple of (rows, width) kernel shapes instead
        of one per batch (each recompile costs seconds; the scan itself is
        ~1 ms per tile).
        """
        pending = self._dispatch_word_rows(encoded)
        return self._collect_word_rows(len(encoded), pending)

    def _dispatch_word_rows(self, encoded: list[bytes]):
        """Pack tiles and dispatch their scans WITHOUT blocking (phase 1);
        the returned handles feed ``_collect_word_rows``. JAX dispatch is
        async, so the device executes while the host does other work —
        ``encode_file`` pre-tokenizes the NEXT chunk in that window."""
        order = sorted(range(len(encoded)), key=lambda i: len(encoded[i]))

        # Phase 1: dispatch every tile's scan before reading any result
        # back — JAX dispatch is async, so all tiles compute (and their
        # device->host copies queue) while the host packs the next tile,
        # instead of paying a full link round trip per tile.
        scan = self._sharded_scan or _scan_encode
        pending: list[tuple[list[int], int, jax.Array]] = []
        for start in range(0, len(order), self._max_rows):
            batch_idx = order[start : start + self._max_rows]
            max_len = len(encoded[batch_idx[-1]])  # length-sorted
            width = 32
            while width < max_len:
                width *= 2
            rows = 128
            while rows < len(batch_idx):
                rows *= 2
            rows = _round_up(rows, self._data_shards)
            tile = np.full((rows, width), PAD, dtype=np.int32)
            for i, idx in enumerate(batch_idx):
                b = encoded[idx]
                tile[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
            result = scan(
                jnp.asarray(tile),
                self._sorted_keys,
                self._sorted_ranks,
                self._sorted_new_syms,
                self._n_syms_dev,
            )
            # uint16 with sentinel 0xFFFF halves the transfer (symbol ids
            # are < n_syms <= 65535, so 0xFFFF is never a valid id).
            packed = jnp.where(result >= 0, result, 0xFFFF).astype(jnp.uint16)
            pending.append((batch_idx, len(batch_idx), packed))
        return pending

    def _collect_word_rows(self, n_words: int, pending):
        out: list[tuple[int, ...] | None] = [None] * n_words
        # Phase 2: ONE consolidated readback. The remote link stalls
        # per transfer (measured: an identical 1 MB copy takes 0.02 s or
        # minutes depending on link state), so tiles are padded to a
        # common width and concatenated ON DEVICE, and a single
        # device->host copy replaces one per tile.
        big_np = None
        row0 = 0
        if len(pending) > 1:
            wmax = max(p.shape[1] for (_, _, p) in pending)
            big = jnp.concatenate(
                [
                    p
                    if p.shape[1] == wmax
                    else jnp.pad(
                        p,
                        ((0, 0), (0, wmax - p.shape[1])),
                        constant_values=0xFFFF,
                    )
                    for (_, _, p) in pending
                ],
                axis=0,
            )
            big_np = np.asarray(big)

        for batch_idx, n, packed in pending:
            if big_np is not None:
                result = big_np[row0 : row0 + n, : packed.shape[1]]
                row0 += packed.shape[0]
            else:
                result = np.asarray(packed)[:n]
            # Vectorized row extraction: boolean-mask flatten preserves
            # row-major order, so one gather + cumsum slicing replaces a
            # per-row numpy loop.
            valid = result != 0xFFFF
            flat = self._out_ids[np.where(valid, result, 0)][valid].tolist()
            lens = valid.sum(axis=1)
            offsets = np.cumsum(lens).tolist()
            prev = 0
            for offset, i in zip(offsets, batch_idx):
                out[i] = tuple(flat[prev:offset])
                prev = offset
        return out


__all__ = ["DeviceEncoder"]
