"""Native C++ pre-tokenizer parity vs the regex reference implementation.

The scanner must reproduce `regex.findall` on the GPT-2 split pattern
byte-for-byte (reference pattern: tokenizer.py:45 / trainer.py:163 of
/root/reference/src/yet_another_bpe), including the trainer-dialect
special-token alternation, on every fixture plus randomized fuzz corpora.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from yabpe_tpu import native
from yabpe_tpu.pretok.patterns import (
    compile_gpt2_pattern,
    compile_trainer_pattern,
)

from .common import DATA, REF_FIXTURES

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

_FUZZ_ALPHABET = list("abc XYZ'01\t\n\r  　中\xdf٣\xbf—\U0001f44b") + [
    "<|endoftext|>",
    "<|eot|>",
    "'ll",
    " '",
    "\U0001f44b\U0001f3fd",  # emoji + skin-tone modifier
]


def _native_tokens(text: str) -> list[str]:
    data = text.encode("utf-8")
    ends = native.pretok_offsets(data)
    out, prev = [], 0
    for end in ends.tolist():
        out.append(data[prev:end].decode("utf-8"))
        prev = end
    return out


@pytest.mark.parametrize(
    "fixture",
    ["address.txt", "german.txt", "tinystories_sample.txt", "corpus.en"],
)
def test_scanner_matches_regex_on_fixtures(fixture):
    text = (REF_FIXTURES / fixture).read_text(encoding="utf-8")
    assert _native_tokens(text) == compile_gpt2_pattern().findall(text)


@pytest.mark.parametrize(
    "text",
    [
        "",
        " ",
        "\n",
        "a",
        "' ",
        "x\n\n\ny",
        "'s'd'm't'll've're'x ' '' a'b",
        "   　 mixed space",
        "  trailing   \n\n\nnewlines\t\ttabs \n",
        "caf\xe9 'S 'LL don't 123٤٥",
    ],
)
def test_scanner_edge_cases(text):
    assert _native_tokens(text) == compile_gpt2_pattern().findall(text)


def test_scanner_fuzz_matches_regex():
    pat = compile_gpt2_pattern()
    rng = random.Random(20260817)
    for _ in range(500):
        text = "".join(
            rng.choice(_FUZZ_ALPHABET) for _ in range(rng.randint(0, 40))
        )
        assert _native_tokens(text) == pat.findall(text), repr(text)


def test_counter_matches_trainer_dialect_fuzz():
    specials = ("<|endoftext|>", "<|eot|>")
    pat = compile_trainer_pattern(specials)
    rng = random.Random(7)
    for _ in range(300):
        text = "".join(
            rng.choice(_FUZZ_ALPHABET) for _ in range(rng.randint(0, 60))
        )
        ref = Counter(t.encode("utf-8") for t in pat.findall(text))
        counter = native.NativeCounter(specials)
        counter.add(text.encode("utf-8"))
        words, lens, counts = counter.export()
        counter.close()
        got: Counter[bytes] = Counter()
        off = 0
        for length, count in zip(lens.tolist(), counts.tolist()):
            got[words[off : off + length]] += count
            off += length
        assert got == ref, repr(text)


def test_word_ids_reconstruct_stream():
    text = (DATA / "multiline.txt").read_text(encoding="utf-8")
    data = text.encode("utf-8")
    counter = native.NativeCounter()
    occ = counter.add_word_ids(data)
    uniq = counter.export_words()
    counter.close()
    rebuilt = b"".join(uniq[i] for i in occ.tolist())
    assert rebuilt == data
    assert [uniq[i].decode("utf-8") for i in occ.tolist()] == (
        compile_gpt2_pattern().findall(text)
    )


def test_word_ids_specials_matches_split_dialect():
    """Combined specials+pretok pass ≡ split-then-findall (tokenizer
    dialect, reference tokenizer.py:100-102,171-190), specials emitted as
    -(1+index) in longest-first order."""
    from yabpe_tpu.pretok.patterns import compile_special_splitter

    specials = ["<|endoftext|>", "<|endoftext|><|endoftext|>", "<|eot|>"]
    sp_sorted = sorted(specials, key=len, reverse=True)
    splitter = compile_special_splitter(sp_sorted)
    pattern = compile_gpt2_pattern()
    cases = [
        "",
        "<|endoftext|>",
        "<|endoftext|><|endoftext|>",  # must match the doubled special once
        "a<|eot|>b",
        "hello <|endoftext|>world<|eot|>",
        "tail text <|endoftext|>",
        "<|eot|>leading",
        "mid<|endoftext|>dle\n\nnext<|endoftext|><|endoftext|>tail '",
    ]
    rng = random.Random(11)
    for _ in range(50):
        cases.append(
            "".join(rng.choice(_FUZZ_ALPHABET) for _ in range(rng.randint(0, 40)))
        )
    for text in cases:
        expected: list[object] = []
        for part in splitter.split(text):
            if not part:
                continue
            if part in sp_sorted:
                expected.append(("S", sp_sorted.index(part)))
            else:
                expected.extend(pattern.findall(part))
        counter = native.NativeCounter(tuple(sp_sorted))
        occ = counter.add_word_ids_specials(text.encode("utf-8"))
        uniq = counter.export_words()
        counter.close()
        got: list[object] = [
            ("S", -i - 1) if i < 0 else uniq[i].decode("utf-8")
            for i in occ.tolist()
        ]
        assert got == expected, text


def test_utf8_validator_matches_python():
    cases = [
        b"hello",
        "Füße 中文 👋🏽 ٣".encode("utf-8"),
        b"",
        b"\x80",  # bare continuation
        b"\xc0\xaf",  # overlong '/'
        b"\xc2",  # truncated 2-byte
        b"\xe0\x80\x80",  # overlong
        b"\xe0\xa0",  # truncated 3-byte
        b"\xed\xa0\x80",  # surrogate D800
        b"\xed\x9f\xbf",  # U+D7FF (valid)
        b"\xf0\x90\x80\x80",  # U+10000 (valid)
        b"\xf0\x80\x80\x80",  # overlong
        b"\xf4\x8f\xbf\xbf",  # U+10FFFF (valid)
        b"\xf4\x90\x80\x80",  # > U+10FFFF
        b"\xf5\x80\x80\x80",  # invalid lead
        b"ok\xffbad",
        b"abc\xe2\x80",  # truncated at end
    ]
    import random as _random

    rng = _random.Random(3)
    for _ in range(500):
        cases.append(bytes(rng.randrange(256) for _ in range(rng.randint(0, 24))))
    for data in cases:
        try:
            data.decode("utf-8")
            py_ok = True
        except UnicodeDecodeError as e:
            py_ok = False
            py_pos = e.start
        pos = native.utf8_invalid_at(data)
        if py_ok:
            assert pos == -1, (data, pos)
        else:
            assert pos == py_pos, (data, pos, py_pos)


def test_ingest_invalid_utf8_raises_positioned_error(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_bytes(b"good text " * 10 + b"\xff\xfe" + b" tail")
    from yabpe_tpu.pretok.ingest import count_pretokens

    with pytest.raises(ValueError, match="invalid UTF-8"):
        count_pretokens([p], ())


def test_train_host_matches_oracle_randomized():
    """Native C++ merge loop ≡ numpy oracle on randomized word tables
    (exact tie-breaking, dedup branch, min_frequency stop)."""
    from yabpe_tpu.train.reference_loop import train_merges_oracle
    from yabpe_tpu import native as native_mod

    rng = random.Random(99)
    for trial in range(25):
        n_words = rng.randint(1, 60)
        counter: Counter[bytes] = Counter()
        for _ in range(n_words):
            length = rng.randint(1, 6)
            word = bytes(rng.choice(b"abcAB\xc3\x9f ") for _ in range(length))
            counter[word] += rng.randint(1, 9)
        vocab_size = rng.randint(257, 300)
        min_freq = rng.choice([1, 1, 2, 3])
        _, oracle_merges = train_merges_oracle(
            counter, [], vocab_size, min_freq
        )
        got = native_mod.train_host(
            dict(counter), vocab_size - 256, min_freq
        )
        assert got == oracle_merges, (trial, counter)


def test_ingest_native_equals_regex_path(tmp_path):
    from yabpe_tpu.pretok.ingest import _count_span, count_pretokens

    text = (REF_FIXTURES / "corpus.en").read_text(encoding="utf-8")
    p = tmp_path / "c.txt"
    p.write_text(text, encoding="utf-8")
    specials = ("<|endoftext|>",)
    native_counts = count_pretokens(
        [p], specials, chunk_size_bytes=16 * 1024, max_workers=4
    )
    # Pure-regex oracle over the *same* spans (chunk boundaries may split
    # pre-tokens — reference-faithful behavior, trainer.py:183-197 — so the
    # oracle must chunk identically).
    from yabpe_tpu.pretok.chunking import chunk_spans

    ref_counts: Counter[bytes] = Counter()
    for start, end in chunk_spans(p, 16 * 1024):
        ref_counts.update(_count_span(str(p), start, end, specials))
    assert native_counts == ref_counts
