"""Host-side pre-tokenization: GPT-2 regex splitting, chunking, ingestion."""

from yabpe_tpu.pretok.patterns import (
    GPT2_SPLIT_PATTERN,
    compile_gpt2_pattern,
    compile_special_splitter,
    compile_trainer_pattern,
)
from yabpe_tpu.pretok.ingest import count_pretokens

__all__ = [
    "GPT2_SPLIT_PATTERN",
    "compile_gpt2_pattern",
    "compile_special_splitter",
    "compile_trainer_pattern",
    "count_pretokens",
]
