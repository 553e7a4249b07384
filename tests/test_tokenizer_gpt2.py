"""Tier-3 conformance: GPT-2 token-id parity + streaming memory ceiling.

The oracle is the reconstructed GPT-2 vocabulary + the golden token ids in
tests/fixtures_gpt2/golden_encode/gpt2_golden.json (produced by the
reference implementation, which was itself verified byte-identical to
tiktoken's gpt2 encoding — tiktoken cannot fetch its files offline).
"""

from __future__ import annotations

import json
import sys

import pytest

from yabpe_tpu import BBPETokenizer
from yabpe_tpu.io import gpt2 as gpt2io

from .common import LOCAL_FIXTURES, REF_FIXTURES


@pytest.fixture(scope="module")
def gpt2_parts():
    merges = gpt2io.load_gpt2_merges(REF_FIXTURES / "gpt2_merges.txt")
    vocab = gpt2io.load_gpt2_vocab(LOCAL_FIXTURES / "gpt2_vocab.json")
    return vocab, merges


@pytest.fixture(scope="module")
def gpt2_tok(gpt2_parts):
    vocab, merges = gpt2_parts
    return BBPETokenizer(
        vocab=vocab, merges=merges, special_tokens=["<|endoftext|>"]
    )


@pytest.fixture(scope="module")
def gpt2_tok_nospecial(gpt2_parts):
    vocab, merges = gpt2_parts
    return BBPETokenizer(vocab=vocab, merges=merges, special_tokens=[])


@pytest.fixture(scope="module")
def golden():
    with open(LOCAL_FIXTURES / "golden_encode" / "gpt2_golden.json") as f:
        return json.load(f)


def test_reconstructed_vocab_shape(gpt2_parts):
    vocab, merges = gpt2_parts
    assert len(vocab) == 50257
    assert len(merges) == 50000
    assert vocab[b"<|endoftext|>"] == 50256


CORPUS_KEYS = [
    "address",
    "german",
    "tinystories_sample",
    "special_trailing",
    "special_double",
    "corpus_en",
]


@pytest.mark.parametrize("key", CORPUS_KEYS)
def test_corpus_parity_with_special(gpt2_tok, golden, key):
    entry = golden[key]
    text = open(entry["path"], encoding="utf-8").read()
    assert gpt2_tok.encode(text) == entry["with_special"]


@pytest.mark.parametrize("key", CORPUS_KEYS)
def test_corpus_parity_no_special(gpt2_tok_nospecial, golden, key):
    entry = golden[key]
    text = open(entry["path"], encoding="utf-8").read()
    assert gpt2_tok_nospecial.encode(text) == entry["no_special"]


def test_snippet_parity(gpt2_tok, gpt2_tok_nospecial, golden):
    entry = golden["snippets"]
    for text, want_s, want_n in zip(
        entry["texts"], entry["with_special"], entry["no_special"]
    ):
        assert gpt2_tok.encode(text) == want_s, repr(text)
        assert gpt2_tok_nospecial.encode(text) == want_n, repr(text)


def test_roundtrip_on_corpora(gpt2_tok, golden):
    for key in CORPUS_KEYS:
        text = open(golden[key]["path"], encoding="utf-8").read()
        assert gpt2_tok.decode(gpt2_tok.encode(text)) == text


@pytest.mark.parametrize("key", ["tinystories_sample", "german", "corpus_en"])
def test_device_encoder_parity(gpt2_tok, golden, key):
    entry = golden[key]
    text = open(entry["path"], encoding="utf-8").read()
    [ids] = gpt2_tok.encode_batch([text], device=True)
    assert ids == entry["with_special"]


def test_overlapping_specials_double_eot(gpt2_parts):
    vocab, merges = gpt2_parts
    double = "<|endoftext|><|endoftext|>"
    vocab = dict(vocab)
    vocab[double.encode()] = 50257
    tok = BBPETokenizer(
        vocab=vocab,
        merges=merges,
        special_tokens=["<|endoftext|>", double],
    )
    assert tok.encode(double) == [50257]
    assert tok.encode("<|endoftext|>") == [50256]


@pytest.mark.skipif(sys.platform != "linux", reason="rlimit is Linux-only")
def test_encode_iterable_memory_ceiling(gpt2_tok, tinystories_5m):
    """Streaming 5 MB line-by-line must not grow RSS by more than ~1 MB."""
    import resource

    # Warm all jit/caches outside the measured region.
    gpt2_tok.clear_cache()
    with open(tinystories_5m, encoding="utf-8") as f:
        head = [next(f) for _ in range(5)]
    for line in head:
        gpt2_tok.encode(line)

    usage_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    count = 0
    with open(tinystories_5m, encoding="utf-8") as f:
        for _tok_id in gpt2_tok.encode_iterable(f):
            count += 1
    usage_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert count > 1_000_000
    # ru_maxrss is a high-water mark; allow modest slack for the LRU cache.
    assert usage_after - usage_before < 8 * 1024, (
        f"RSS grew {usage_after - usage_before} KiB during streaming encode"
    )
