"""Core dtypes and pure functions: vocab tables, padded words, lex keys."""

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import PAD, WordTable

__all__ = ["Vocab", "WordTable", "PAD"]
