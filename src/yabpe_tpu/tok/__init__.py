"""Tokenization: host tokenizer API + batched device encoder."""

from yabpe_tpu.tok.tokenizer import BBPETokenizer

__all__ = ["BBPETokenizer"]
