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

    cum = np.cumsum(probs)
    lex_cap = [w.capitalize() for w in lex]

    target = int(size_mb * 1024 * 1024)
    written = 0
    punct = [".", ",", "!", "?", ";"]
    # Batched sampling: inverse-CDF via searchsorted (rng.choice with a
    # probability vector is O(lexicon) per draw and unusable at GB scale).
    sentences_per_batch = 100_000
    with open(path, "w", encoding="utf-8") as f:
        while written < target:
            n_words = rng.integers(5, 18, size=sentences_per_batch)
            total = int(n_words.sum())
            idx = np.searchsorted(cum, rng.random(total))
            p_idx = rng.integers(0, len(punct), size=sentences_per_batch)
            kind = rng.random(sentences_per_batch)
            parts: list[str] = []
            pos = 0
            for s in range(sentences_per_batch):
                n = int(n_words[s])
                words = idx[pos : pos + n]
                pos += n
                parts.append(lex_cap[words[0]])
                for w in words[1:].tolist():
                    parts.append(" ")
                    parts.append(lex[w])
                parts.append(punct[p_idx[s]])
                k = kind[s]
                if k < 0.12:
                    parts.append("\n<|endoftext|>\n")
                elif k < 0.82:
                    parts.append(" ")
                else:
                    parts.append("\n")
            chunk = "".join(parts)
            f.write(chunk)
            written += len(chunk)
            if written >= target:
                break
    print(f"wrote {written} bytes to {path} (lexicon {lexicon_size})")


if __name__ == "__main__":
    out = sys.argv[1]
    size_mb = float(sys.argv[2])
    lexicon = int(sys.argv[3]) if len(sys.argv) > 3 else 50000
    generate(out, size_mb, lexicon)
