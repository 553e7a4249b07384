"""Tier-3 conformance: exact trainer parity + speed gate + snapshot."""

from __future__ import annotations

import json
import time

import pytest

from yabpe_tpu.io import gpt2 as gpt2io

from .adapters import run_train_bpe
from .common import LOCAL_FIXTURES, REF_FIXTURES


@pytest.mark.parametrize("native_loop", [True, False], ids=["native", "device"])
def test_train_bpe_exact_merges_and_vocab(native_loop):
    vocab, merges = run_train_bpe(
        input_path=REF_FIXTURES / "corpus.en",
        vocab_size=500,
        special_tokens=["<|endoftext|>"],
        use_native_loop=native_loop,
    )

    reference_merges = gpt2io.load_gpt2_merges(
        REF_FIXTURES / "train-bpe-reference-merges.txt"
    )
    assert merges == reference_merges

    with open(LOCAL_FIXTURES / "train-bpe-reference-vocab.json") as f:
        ref_vocab_str = json.load(f)
    reference_vocab = {
        idx: gpt2io.decode_token(tok) for tok, idx in ref_vocab_str.items()
    }
    assert set(vocab.keys()) == set(reference_vocab.keys())
    assert set(vocab.values()) == set(reference_vocab.values())


def test_train_bpe_speed():
    """Steady-state speed gate (mirrors the reference's 1.5 s CI gate,
    /root/reference/tests/test_train_bpe_gpt2.py:8-24, measured after a
    warm-up run so jit compilation is excluded)."""
    run_train_bpe(
        input_path=REF_FIXTURES / "corpus.en",
        vocab_size=500,
        special_tokens=["<|endoftext|>"],
    )
    start = time.time()
    run_train_bpe(
        input_path=REF_FIXTURES / "corpus.en",
        vocab_size=500,
        special_tokens=["<|endoftext|>"],
    )
    assert time.time() - start < 1.5


def test_train_bpe_special_tokens(snapshot, tinystories_5m):
    """Specials must never merge with surrounding text (5 MB corpus)."""
    vocab, merges = run_train_bpe(
        input_path=tinystories_5m,
        vocab_size=1000,
        special_tokens=["<|endoftext|>"],
    )
    for word_bytes in vocab.values():
        if word_bytes != b"<|endoftext|>":
            assert b"<|" not in word_bytes

    snapshot.assert_match(
        {
            "vocab_keys": set(vocab.keys()),
            "vocab_values": set(vocab.values()),
            "merges": merges,
        },
        test_name="test_train_bpe_special_tokens",
    )
