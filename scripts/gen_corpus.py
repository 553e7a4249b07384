"""Deterministic synthetic corpus generator for large-scale benchmarks.

Builds a Zipf-distributed corpus over a synthetic lexicon so unique-pre-token
counts scale realistically with corpus size (repeating a small fixture gives
unrealistically few unique words). Pure numpy, fixed seed, no network.

Usage: python scripts/gen_corpus.py OUT_PATH SIZE_MB [LEXICON_SIZE]
"""

from __future__ import annotations

import sys

import numpy as np

_CONSONANTS = list("bcdfghjklmnpqrstvwxz")
_VOWELS = list("aeiouy")


def make_lexicon(n: int, rng: np.random.Generator) -> list[str]:
    words = set()
    out = []
    while len(out) < n:
        syllables = rng.integers(1, 5)
        w = "".join(
            rng.choice(_CONSONANTS) + rng.choice(_VOWELS)
            + (rng.choice(_CONSONANTS) if rng.random() < 0.3 else "")
            for _ in range(syllables)
        )
        if w not in words:
            words.add(w)
            out.append(w)
    return out


def generate(path: str, size_mb: float, lexicon_size: int = 50000,
             seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    lex = make_lexicon(lexicon_size, rng)
    ranks = np.arange(1, lexicon_size + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()

    target = int(size_mb * 1024 * 1024)
    written = 0
    punct = [".", ",", "!", "?", ";"]
    with open(path, "w", encoding="utf-8") as f:
        while written < target:
            n_words = int(rng.integers(5, 18))
            idx = rng.choice(lexicon_size, size=n_words, p=probs)
            sentence_words = [lex[i] for i in idx]
            sentence_words[0] = sentence_words[0].capitalize()
            sentence = (
                " ".join(sentence_words) + str(rng.choice(punct))
            )
            if rng.random() < 0.12:
                sentence += "\n<|endoftext|>\n"
            else:
                sentence += " " if rng.random() < 0.8 else "\n"
            f.write(sentence)
            written += len(sentence)
    print(f"wrote {written} bytes to {path} (lexicon {lexicon_size})")


if __name__ == "__main__":
    out = sys.argv[1]
    size_mb = float(sys.argv[2])
    lexicon = int(sys.argv[3]) if len(sys.argv) > 3 else 50000
    generate(out, size_mb, lexicon)
