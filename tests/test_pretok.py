"""Tier-1 unit tests: chunking, pre-tokenization, ingestion."""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import pytest

from yabpe_tpu.pretok import chunking
from yabpe_tpu.pretok.ingest import count_pretokens
from yabpe_tpu.pretok.patterns import (
    compile_gpt2_pattern,
    compile_special_splitter,
    compile_trainer_pattern,
)

from .common import DATA


def test_chunk_spans_cover_file_exactly(tmp_path: Path):
    text = "hello wörld 東京 " * 500
    p = tmp_path / "t.txt"
    p.write_text(text, encoding="utf-8")
    spans = chunking.chunk_spans(p, 100)
    # spans tile the file with no gaps or overlaps
    assert spans[0][0] == 0
    assert spans[-1][1] == p.stat().st_size
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 == s1
    # every span decodes standalone
    joined = b"".join(chunking.read_span(p, s, e) for s, e in spans)
    assert joined.decode("utf-8") == text
    for s, e in spans:
        chunking.read_span(p, s, e).decode("utf-8")  # must not raise


def test_chunk_spans_utf8_boundary_cjk(tmp_path: Path):
    text = "東京都渋谷区" * 200 + "end"
    p = tmp_path / "cjk.txt"
    p.write_text(text, encoding="utf-8")
    for size in (97, 100, 101, 128):
        spans = chunking.chunk_spans(p, size)
        for s, e in spans:
            chunking.read_span(p, s, e).decode("utf-8")


def test_chunk_spans_newline_alignment(tmp_path: Path):
    p = tmp_path / "nl.txt"
    p.write_text("line one\nline two\nline three\n" * 50, encoding="utf-8")
    spans = chunking.chunk_spans(p, 64, align_to_newline=True)
    data = p.read_bytes()
    for _, e in spans[:-1]:
        assert data[e - 1 : e] == b"\n"


def test_gpt2_pattern_reconstruction():
    pattern = compile_gpt2_pattern()
    for text in [
        "Hello, world! It's 2024.",
        "  multiple   spaces\t\ttabs\n\nnewlines",
        "don't can't I'll we've you're he's",
        "naïve café über 東京 🚀🚀",
        "",
    ]:
        assert "".join(pattern.findall(text)) == text


def test_trainer_pattern_specials_whole_pretokens():
    pattern = compile_trainer_pattern(["<|endoftext|>"])
    toks = pattern.findall("a<|endoftext|>b")
    assert "<|endoftext|>" in toks
    assert "".join(toks) == "a<|endoftext|>b"


def test_special_splitter_longest_first():
    splitter = compile_special_splitter(["<|eot|>", "<|eot|><|eot|>"])
    parts = [p for p in splitter.split("x<|eot|><|eot|>y") if p]
    assert parts == ["x", "<|eot|><|eot|>", "y"]


def test_count_pretokens_worker_invariance(tmp_path: Path):
    p = tmp_path / "c.txt"
    p.write_text("the cat sat on the mat. " * 300, encoding="utf-8")
    base = count_pretokens([p], [], chunk_size_bytes=256, max_workers=1)
    for workers in (2, 4, 8):
        assert (
            count_pretokens([p], [], chunk_size_bytes=256, max_workers=workers)
            == base
        )


def test_count_pretokens_chunk_size_invariance_newline_aligned(tmp_path: Path):
    p = tmp_path / "c.txt"
    p.write_text("the cat sat on the mat.\n" * 300, encoding="utf-8")
    big = count_pretokens([p], [], chunk_size_bytes=1 << 30, max_workers=1)
    small = count_pretokens(
        [p], [], chunk_size_bytes=128, max_workers=4, align_to_newline=True
    )
    assert big == small


def test_count_pretokens_missing_file():
    with pytest.raises(FileNotFoundError):
        count_pretokens(["/no/such/file.txt"], [], max_workers=1)


def test_count_pretokens_empty_file(tmp_path: Path):
    p = tmp_path / "e.txt"
    p.write_text("")
    assert count_pretokens([p], [], max_workers=1) == Counter()


def test_count_pretokens_invalid_utf8(tmp_path: Path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"ok \xff\xfe bad")
    with pytest.raises(ValueError, match="invalid UTF-8 at position 3"):
        count_pretokens([p], [], max_workers=1)


def test_count_pretokens_byte_reconstruction():
    """Summing (pretoken bytes * count) reconstructs the corpus exactly."""
    sample = DATA / "sample.txt"
    counts = count_pretokens([sample], [], max_workers=1)
    total = sum(len(w) * c for w, c in counts.items())
    assert total == sample.stat().st_size
