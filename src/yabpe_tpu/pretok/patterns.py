"""Pre-tokenization regex patterns.

The GPT-2 pre-tokenization pattern is the canonical one published with the
OpenAI GPT-2 encoder (also used by tiktoken's ``gpt2`` encoding). Behavioral
parity targets: reference trainer pretokenization
(/root/reference/src/yet_another_bpe/trainer.py:162-169) and tokenizer
pattern handling (/root/reference/src/yet_another_bpe/tokenizer.py:44-45,
88-104).

Two *distinct* special-token dialects exist in the reference and both are
reproduced here:

- **Trainer dialect** (:func:`compile_trainer_pattern`): special tokens are
  prepended to the GPT-2 alternation *in config order* and matched by
  ``findall`` — each special becomes an ordinary pre-token whose raw UTF-8
  bytes then participate in training statistics.
- **Tokenizer dialect** (:func:`compile_special_splitter`): special tokens are
  compiled into a separate capturing split pattern sorted longest-first, so
  overlapping specials match greedily (e.g. ``<|eot|><|eot|>`` as one special
  beats two shorter ones).
"""

from __future__ import annotations

from collections.abc import Sequence

import regex

# Canonical GPT-2 pre-tokenization pattern (OpenAI GPT-2 encoder.py).
GPT2_SPLIT_PATTERN: str = (
    r"""'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


def compile_gpt2_pattern() -> "regex.Pattern[str]":
    """Compile the plain GPT-2 pre-tokenization pattern."""
    return regex.compile(GPT2_SPLIT_PATTERN)


def compile_trainer_pattern(special_tokens: Sequence[str]) -> "regex.Pattern[str]":
    """Compile the trainer-side findall pattern.

    Specials are alternated ahead of the GPT-2 pattern in *config order*
    (not longest-first), matching the reference trainer's behavior.
    """
    if not special_tokens:
        return compile_gpt2_pattern()
    escaped = "|".join(regex.escape(t) for t in special_tokens)
    return regex.compile(f"{escaped}|{GPT2_SPLIT_PATTERN}")


def compile_special_splitter(
    special_tokens: Sequence[str],
) -> "regex.Pattern[str] | None":
    """Compile the tokenizer-side capturing split pattern (longest-first).

    Returns None when there are no special tokens.
    """
    if not special_tokens:
        return None
    ordered = sorted(special_tokens, key=len, reverse=True)
    escaped = "|".join(regex.escape(t) for t in ordered)
    return regex.compile(f"({escaped})")
