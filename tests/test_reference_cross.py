"""Cross-implementation conformance: train + encode vs the actual upstream
implementation (imported from the read-only reference mount) on randomized
corpora. The golden fixtures pin a handful of cases; this pins the long
tail — tie-breaking, dedup, specials-in-training, unicode edges.

Skipped automatically when the reference mount is absent.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not (REF_SRC / "yet_another_bpe").is_dir(),
    reason="reference implementation not mounted",
)


@pytest.fixture(scope="module")
def ref_mod():
    sys.path.insert(0, str(REF_SRC))
    try:
        import yet_another_bpe

        yield yet_another_bpe
    finally:
        sys.path.remove(str(REF_SRC))


_WORDS = [
    "the", "cat", "sat", "Straße", "中文", "don't", "it's", "'ll",
    "123", "42.5", "...", "!!", "👋🏽", "a", "b", "ab", "abc",
]
_SEPS = [" ", "  ", "\n", "\n\n", "\t", " \n "]


def _random_corpus(rng: random.Random, n_sentences: int) -> str:
    parts = []
    for _ in range(n_sentences):
        n = rng.randint(1, 12)
        parts.append(
            rng.choice(_SEPS).join(rng.choice(_WORDS) for _ in range(n))
        )
        if rng.random() < 0.2:
            parts.append("<|endoftext|>")
        parts.append(rng.choice(_SEPS))
    return "".join(parts)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_train_matches_reference_on_random_corpora(ref_mod, tmp_path, seed):
    rng = random.Random(seed)
    text = _random_corpus(rng, rng.randint(30, 200))
    corpus = tmp_path / "c.txt"
    corpus.write_text(text, encoding="utf-8")
    vocab_size = rng.choice([280, 320, 500])
    min_freq = rng.choice([1, 2])

    ref_cfg = ref_mod.BBPETrainerConfig(
        vocab_size=vocab_size,
        min_frequency=min_freq,
        max_workers=1,
        chunk_size_bytes=1 << 30,
        special_tokens=["<|endoftext|>"],
    )
    ref_model = ref_mod.BBPETrainer(ref_cfg).train([corpus])

    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    ours = BBPETrainer(
        BBPETrainerConfig(
            vocab_size=vocab_size,
            min_frequency=min_freq,
            max_workers=1,
            chunk_size_bytes=1 << 30,
            special_tokens=["<|endoftext|>"],
        )
    ).train([corpus])

    assert ours.merges == ref_model.merges
    assert ours.vocab == ref_model.vocab


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_encode_matches_reference_on_random_text(ref_mod, tmp_path, seed):
    rng = random.Random(seed)
    train_text = _random_corpus(rng, 120)
    corpus = tmp_path / "c.txt"
    corpus.write_text(train_text, encoding="utf-8")

    ref_cfg = ref_mod.BBPETrainerConfig(
        vocab_size=400,
        min_frequency=1,
        max_workers=1,
        chunk_size_bytes=1 << 30,
        special_tokens=["<|endoftext|>"],
    )
    ref_trainer = ref_mod.BBPETrainer(ref_cfg)
    ref_model = ref_trainer.train([corpus])
    ref_tok = ref_mod.BBPETokenizer(
        vocab=ref_model.vocab,
        merges=ref_model.merges,
        special_tokens=["<|endoftext|>"],
    )

    from yabpe_tpu import BBPETokenizer

    ours_tok = BBPETokenizer(
        vocab=ref_model.vocab,
        merges=ref_model.merges,
        special_tokens=["<|endoftext|>"],
    )

    for _ in range(10):
        sample = _random_corpus(rng, rng.randint(1, 20))
        expected = ref_tok.encode(sample)
        assert ours_tok.encode(sample) == expected
        assert ours_tok.encode_batch([sample], device=True) == [expected]
        assert ours_tok.decode(expected) == ref_tok.decode(expected)
