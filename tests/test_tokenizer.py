"""Tier-1/2 tokenizer tests: encode/decode semantics, batch APIs, edges."""

from __future__ import annotations

from pathlib import Path

import pytest

from yabpe_tpu import BBPETokenizer, BBPETrainer, BBPETrainerConfig

from .common import DATA


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory) -> Path:
    out = tmp_path_factory.mktemp("model")
    cfg = BBPETrainerConfig(
        vocab_size=400,
        min_frequency=1,
        max_workers=1,
        special_tokens=["<|endoftext|>"],
    )
    tr = BBPETrainer(cfg)
    tr.train([DATA / "sample.txt", DATA / "unicode.txt"])
    tr.save(out)
    return out


@pytest.fixture(scope="module")
def tok(model_dir) -> BBPETokenizer:
    return BBPETokenizer.from_file(model_dir)


@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        "The curious engineer measured throughput.",
        "naïve café über",
        "東京都渋谷区 中文 日本語",
        "مرحبا بالعالم",
        "Привет мир",
        "emoji 🚀🙃🎉 end",
        "   \t\n  ",
        "",
        "a",
        "don't we'll I've you're",
        "x" * 5000,
    ],
)
def test_roundtrip(tok, text):
    assert tok.decode(tok.encode(text)) == text


def test_empty_init():
    """No-argument construction (reference test_tokenizer.py:19-24)."""
    t = BBPETokenizer()
    assert t.vocab_size == 0
    assert t.special_tokens == []
    assert t.encode("") == []
    assert t.decode([]) == ""


def test_init_with_vocab_only():
    """Vocab-only construction (reference test_tokenizer.py:26-40)."""
    t = BBPETokenizer(vocab={b"a": 0, b"b": 1, b"ab": 2})
    assert t.vocab_size == 3
    assert t.get_vocab() == {"a": 0, "b": 1, "ab": 2}
    t2 = BBPETokenizer(vocab={b"a": 0, b"b": 1, b"ab": 2}, merges=[(b"a", b"b")])
    assert t2.vocab_size == 3


def test_init_with_special_tokens_only():
    """Specials-only construction (reference test_tokenizer.py:42-48)."""
    t = BBPETokenizer(special_tokens=["[PAD]", "[UNK]"])
    assert t.special_tokens == ["[PAD]", "[UNK]"]


def test_from_file_nonexistent_directory():
    """Reference test_tokenizer.py:129-133."""
    with pytest.raises(FileNotFoundError):
        BBPETokenizer.from_file("/nonexistent/path")


def test_decode_edge_cases(tok):
    """Empty list, single token, invalid-id-only list (reference
    test_tokenizer.py:221-249)."""
    assert tok.decode([]) == ""
    some_id = tok.encode("a")[0]
    assert tok.decode([some_id]) == "a"
    bogus = [tok.vocab_size + 7, tok.vocab_size + 8]
    assert tok.decode(bogus) == ""


def test_batch_empty_inputs(tok):
    """Empty batches (reference test_tokenizer.py:339-370)."""
    assert tok.encode_batch([]) == []
    assert tok.decode_batch([]) == []
    assert tok.encode_batch([""]) == [[]]


def test_special_token_roundtrip(tok):
    text = "story one<|endoftext|>story two<|endoftext|>"
    ids = tok.encode(text)
    special_id = tok.encode("<|endoftext|>")[0]
    assert ids.count(special_id) == 2
    assert tok.decode(ids) == text


def test_empty_encode_decode(tok):
    assert tok.encode("") == []
    assert tok.decode([]) == ""


def test_decode_skips_unknown_ids(tok):
    ids = tok.encode("hello")
    noisy = [10**9] + ids + [10**9 + 1]
    assert tok.decode(noisy) == "hello"


def test_decode_invalid_utf8_replaces():
    vocab = {bytes([b]): b for b in range(256)}
    t = BBPETokenizer(vocab=vocab, merges=[])
    assert t.decode([0xFF]) == "�"


def test_batch_apis(tok):
    texts = ["one", "two 東京", "", "three<|endoftext|>"]
    batch = tok.encode_batch(texts)
    assert batch == [tok.encode(t) for t in texts]
    assert tok.decode_batch(batch) == texts


def test_encode_batch_device_matches_host(tok):
    texts = [
        (DATA / "sample.txt").read_text(encoding="utf-8"),
        "short",
        "unicode 東京 🚀<|endoftext|>tail",
        "",
    ]
    assert tok.encode_batch(texts, device=True) == tok.encode_batch(texts)


def test_encode_file_parallel_exact(tok, tmp_path):
    """encode_file (pretoken-safe chunked, process pool) ≡ whole-text encode,
    across chunk boundaries and specials."""
    import numpy as np

    base = (DATA / "sample.txt").read_text(encoding="utf-8")
    text = (base + "\n<|endoftext|>\n") * 40  # force several 4 KiB chunks
    p = tmp_path / "corpus.txt"
    p.write_text(text, encoding="utf-8")
    got = tok.encode_file(p, max_workers=3, chunk_bytes=4096)
    expected = np.asarray(tok.encode(text), dtype=np.int32)
    assert np.array_equal(got, expected)


def test_encode_file_device_exact_and_cache_persists(tok, tmp_path):
    """encode_file(device=True) (pipelined chunk scan + device tiles) ≡
    whole-text encode, and the device word cache persists across calls
    (a second file re-encodes with zero new unique words)."""
    import numpy as np

    base = (DATA / "sample.txt").read_text(encoding="utf-8")
    text = (base + "\n<|endoftext|>\n") * 40
    p = tmp_path / "corpus.txt"
    p.write_text(text, encoding="utf-8")
    got = tok.encode_file(p, chunk_bytes=4096, device=True)
    expected = np.asarray(tok.encode(text), dtype=np.int32)
    assert np.array_equal(got, expected)

    enc = tok._get_device_encoder(None)
    cached = len(enc._word_cache_b)
    assert cached > 0
    p2 = tmp_path / "corpus2.txt"
    p2.write_text(text[: len(text) // 2 + 7], encoding="utf-8")
    got2 = tok.encode_file(p2, chunk_bytes=4096, device=True)
    expected2 = np.asarray(
        tok.encode(text[: len(text) // 2 + 7]), dtype=np.int32
    )
    assert np.array_equal(got2, expected2)


def test_encode_file_encoder_pool_reused(tok, tmp_path):
    """Repeated encode_file calls must reuse the persistent encoder pool
    (warm word caches across calls) and stay byte-identical, including
    after clear_cache() and under concurrent encode_file calls (which
    must not share native handles)."""
    import numpy as np

    from yabpe_tpu import native

    base = (DATA / "sample.txt").read_text(encoding="utf-8")
    p = tmp_path / "corpus.txt"
    p.write_text(base * 20, encoding="utf-8")
    first = tok.encode_file(p, max_workers=2, chunk_bytes=4096)
    if native.available():
        pool = tok._file_encoder_pool
        assert len(pool) >= 1
        again = tok.encode_file(p, max_workers=2, chunk_bytes=4096)
        assert tok._file_encoder_pool is pool  # same pool object, reused
        assert len(pool) <= 2  # one encoder per worker thread, not per call
        assert np.array_equal(first, again)
    tok.clear_cache()
    assert np.array_equal(first, tok.encode_file(p, max_workers=2,
                                                 chunk_bytes=4096))
    # Concurrent calls: the pool hands its encoders to one call at a
    # time; the other builds transient ones. Results must stay exact.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [
            ex.submit(tok.encode_file, p, max_workers=2, chunk_bytes=4096)
            for _ in range(4)
        ]
        for f in futs:
            assert np.array_equal(first, f.result())


def test_encoder_pool_rejects_foreign_tables(tmp_path):
    """The module-level encoder_pool API must refuse reuse with different
    vocab/merges (the pooled encoders bake in the first call's ranks)."""
    import pytest

    from yabpe_tpu import native
    from yabpe_tpu.tok.parallel_encode import EncoderPool

    if not native.available():
        pytest.skip("native runtime unavailable")
    pool = EncoderPool()
    a = ({(1, 2): (0, 300)}, [0])
    b = ({(3, 4): (0, 301)}, [1])
    pool.release(pool.claim(*a))
    pool.release(pool.claim(*a))  # same tables: fine
    with pytest.raises(ValueError):
        pool.claim(*b)


def test_encode_file_exact_across_whitespace_runs(tok, tmp_path):
    """Chunk cuts must never split or end inside a whitespace run: GPT-2's
    \\s+(?!\\S) tokenizes a run at end-of-buffer differently from mid-text
    (regression: 'x\\n\\nline' chunked after the second \\n gave '\\n\\n' as
    one pre-token where serial encode gives '\\n' + '\\n')."""
    import numpy as np

    corpora = [
        # Blank-line paragraph breaks at essentially every boundary.
        ("para. one two three\n\npara two follows here\n\n" * 400),
        # Trailing-space lines and CRLF runs.
        ("line with trailing spaces   \r\n\r\nnext line\t\t\n" * 300),
        # Unicode whitespace (NBSP, ideographic space) inside runs.
        ("word  next 東京　　end\n\n" * 250),
        # No newlines at all: only space transitions are available.
        ("alpha beta gamma delta " * 800),
        # Specials adjacent to whitespace runs.
        ("doc one<|endoftext|>\n\n doc two <|endoftext|>  \n" * 200),
    ]
    for i, text in enumerate(corpora):
        p = tmp_path / f"ws{i}.txt"
        p.write_text(text, encoding="utf-8")
        expected = np.asarray(tok.encode(text), dtype=np.int32)
        for chunk in (1024, 4096):
            got = tok.encode_file(p, max_workers=3, chunk_bytes=chunk)
            assert np.array_equal(got, expected), (i, chunk)


def test_safe_cut_points_invariants(tmp_path):
    """Spans partition the file; every interior cut is a non-ws\u2192ws
    transition; a file with no such transition is one span."""
    import regex

    from yabpe_tpu.tok.parallel_encode import safe_cut_points

    ws = regex.compile(r"\s")
    text = "one two\n\n  three four " * 500
    p = tmp_path / "t.txt"
    p.write_text(text, encoding="utf-8")
    data = p.read_bytes()
    spans = safe_cut_points(p, 2048, ["<|endoftext|>"])
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    for (_, b), (c, _) in zip(spans, spans[1:]):
        assert b == c
        left = data[:b].decode("utf-8")
        right = data[b:].decode("utf-8")
        assert left and right
        assert ws.fullmatch(left[-1]) is None, repr(left[-10:])
        assert ws.fullmatch(right[0]) is not None, repr(right[:10])

    nows = tmp_path / "nows.txt"
    nows.write_text("z" * 10000, encoding="utf-8")
    assert safe_cut_points(nows, 1024, []) == [(0, 10000)]


def test_encode_file_randomized_property(tok, tmp_path):
    """Randomized corpora with exotic whitespace and specials: chunked
    encode_file must equal serial encode for every seed and chunk size."""
    import random

    import numpy as np

    ws_pool = [" ", "\n", "\t", "\r\n", "\n\n", " ", " ", "　",
               " \n ", "\x1c", "\v\f"]
    word_pool = ["alpha", "βήτα", "東京", "mid-word", "don't", "123", "!!",
                 "<|endoftext|>", "🚀", "x" * 40, "-" * 25]
    for seed in range(6):
        rng = random.Random(seed)
        pieces = []
        for _ in range(4000):
            pieces.append(rng.choice(word_pool))
            pieces.append(rng.choice(ws_pool))
        text = "".join(pieces)
        p = tmp_path / f"r{seed}.txt"
        p.write_text(text, encoding="utf-8")
        expected = np.asarray(tok.encode(text), dtype=np.int32)
        chunk = rng.choice([512, 1024, 4096])
        got = tok.encode_file(p, max_workers=2, chunk_bytes=chunk)
        assert np.array_equal(got, expected), (seed, chunk)


def test_encode_file_invalid_utf8_raises_positioned(tok, tmp_path):
    """encode_file must raise the positioned ValueError for invalid UTF-8
    (and release its native encoder handles on the error path)."""
    p = tmp_path / "bad.txt"
    data = b"valid text here " * 300 + b"\xff\xfe" + b" tail" * 10
    p.write_bytes(data)
    with pytest.raises(ValueError, match="invalid UTF-8"):
        tok.encode_file(p, max_workers=2, chunk_bytes=1024)
    # The tokenizer must remain fully usable afterwards.
    assert tok.decode(tok.encode("still works")) == "still works"


def test_encode_iterable_streams(tok):
    with open(DATA / "sample.txt", encoding="utf-8") as f:
        streamed = list(tok.encode_iterable(f))
    whole = tok.encode((DATA / "sample.txt").read_text(encoding="utf-8"))
    assert streamed == whole


def test_unknown_word_fallback_unk():
    # Vocab without byte 0x7a ("z"); [UNK] declared.
    vocab = {bytes([b]): b for b in range(122)}
    vocab[b"[UNK]"] = 500
    t = BBPETokenizer(vocab=vocab, merges=[], special_tokens=[])
    assert t.encode("z") == [500]
    # without [UNK], falls back to id 0
    del vocab[b"[UNK]"]
    t2 = BBPETokenizer(vocab=vocab, merges=[])
    assert t2.encode("z") == [0]


def test_introspection(tok):
    assert tok.vocab_size == 400 or tok.vocab_size <= 400  # dedups may shrink
    assert tok.special_tokens == ["<|endoftext|>"]
    vocab = tok.get_vocab()
    assert isinstance(vocab, dict) and len(vocab) == tok.vocab_size
    tok.clear_cache()
    info = tok.cache_info()
    assert "hits=0" in info and "misses=0" in info
    tok.encode("hello hello")
    assert "misses=" in tok.cache_info()


def test_overlapping_specials_longest_first():
    vocab = {bytes([b]): b for b in range(256)}
    vocab[b"<|eot|>"] = 256
    vocab[b"<|eot|><|eot|>"] = 257
    t = BBPETokenizer(
        vocab=vocab, merges=[], special_tokens=["<|eot|>", "<|eot|><|eot|>"]
    )
    ids = t.encode("<|eot|><|eot|>")
    assert ids == [257]


def test_from_file_tolerates_malformed_merge_lines(tmp_path: Path):
    (tmp_path / "vocab.json").write_text('{"a": 97, "b": 98, "ab": 256}')
    (tmp_path / "merges.txt").write_text("a b\n\nmalformedline\n")
    t = BBPETokenizer.from_file(tmp_path)
    assert t.encode("ab") == [256]


def test_device_encode_falls_back_for_huge_symbol_table():
    """A vocab whose extended symbol table exceeds the device kernel's
    packed uint32 pair-key range must transparently use the host path."""
    vocab = {bytes([b]): b for b in range(256)}
    # All 65,536 byte-pair products: 256 + 65,536 = 65,792 extended
    # symbols, past the 65,535 uint32 pair-key limit.
    merges = []
    nxt = 256
    for i in range(256):
        for j in range(256):
            a, b = bytes([i]), bytes([j])
            vocab[a + b] = nxt
            merges.append((a, b))
            nxt += 1
    tok = BBPETokenizer(vocab=vocab, merges=merges)
    texts = ["hello world", ""]
    assert tok.encode_batch(texts, device=True) == tok.encode_batch(texts)
    # The failure is cached: repeat calls must not rebuild the symbol
    # tables just to fail again.
    assert tok._device_encoder[1] is None
    assert tok._get_device_encoder(None) is None


def test_more_than_64_special_tokens_exact():
    """Specials beyond the native scanner's old 64-entry cap must still be
    split out (regression: the C path silently truncated the list, so
    specials ranked 65+ by length were BPE-encoded as plain bytes)."""
    vocab = {bytes([b]): b for b in range(256)}
    specials = [f"<|reserved_{i:03d}|>" for i in range(100)]
    for i, s in enumerate(specials):
        vocab[s.encode("utf-8")] = 256 + i
    t = BBPETokenizer(vocab=vocab, merges=[], special_tokens=specials)
    text = "a" + specials[99] + "b" + specials[0] + specials[80]
    ids = t.encode(text)
    assert ids == [ord("a"), 256 + 99, ord("b"), 256, 256 + 80]
    assert t.decode(ids) == text
    # Training-dialect scanner too: specials are whole words in counts.
    from yabpe_tpu import BBPETrainerConfig

    cfg = BBPETrainerConfig(
        vocab_size=256 + len(specials),
        min_frequency=1,
        max_workers=1,
        special_tokens=specials,
    )
    tr = BBPETrainer(cfg)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    model = tr.train([path])
    for s in specials:
        assert s.encode("utf-8") in model.vocab


def test_hostmem_tuning_is_idempotent():
    from yabpe_tpu.utils import hostmem

    assert hostmem.tune_malloc() in (True, False)
    assert hostmem.tune_malloc() in (True, False)
    # warming down to an already-warmed size is a no-op
    first = hostmem.warm_heap(8)
    again = hostmem.warm_heap(8)
    assert again == 0 or first == 0


def test_device_encode_fallback_past_packed_key_range(caplog):
    """>65535 extended symbols: encode_batch(device=True) must fall back
    to the host path (with a warning) and still return host-exact ids.

    Pins the silent-fallback path at tok/tokenizer.py (SymbolTableTooLarge
    -> cached None encoder); 65,536 two-byte merges push the extended
    symbol table to 256 + 65,536 entries, past the packed uint32 pair-key
    range of the device kernel.
    """
    import logging

    from yabpe_tpu import BBPETokenizer

    merges = [
        (bytes([x]), bytes([y])) for x in range(256) for y in range(256)
    ]
    vocab = {bytes([b]): b for b in range(256)}
    for i, (l, r) in enumerate(merges):
        tok_bytes = l + r
        if tok_bytes not in vocab:
            vocab[tok_bytes] = 256 + i
    tok = BBPETokenizer(vocab=vocab, merges=merges, special_tokens=[])

    texts = ["hello world", "aa bb cc"]
    host = tok.encode_batch(texts)
    with caplog.at_level(logging.WARNING):
        dev = tok.encode_batch(texts, device=True)
    assert dev == host
    # The oversize table is cached as "no device encoder" so later calls
    # skip straight to the host path without rebuilding symbol tables.
    assert tok._device_encoder.get(1, "missing") is None
