"""External-interface adapters (CS336-conformance-shaped surface).

Mirrors the adapter layer the reference exposes to its conformance harness
(/root/reference/tests/adapters.py): an {id: bytes} vocabulary convention,
``encode_iterable`` streaming, and a fixed-parity training entry point.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from pathlib import Path

from yabpe_tpu import BBPETokenizer, BBPETrainer, BBPETrainerConfig


class TokenizerAdapter:
    def __init__(self, tokenizer: BBPETokenizer) -> None:
        self._tokenizer = tokenizer

    def encode(self, text: str) -> list[int]:
        return self._tokenizer.encode(text)

    def decode(self, ids: list[int]) -> str:
        return self._tokenizer.decode(ids)

    def encode_iterable(self, iterable: Iterable[str]) -> Iterator[int]:
        return self._tokenizer.encode_iterable(iterable)


def get_tokenizer(
    vocab: dict[int, bytes],
    merges: list[tuple[bytes, bytes]],
    special_tokens: list[str] | None = None,
) -> TokenizerAdapter:
    """Build a tokenizer from an external {id: bytes} vocabulary."""
    return TokenizerAdapter(
        BBPETokenizer(
            vocab={v: k for k, v in vocab.items()},
            merges=merges,
            special_tokens=special_tokens or [],
        )
    )


def run_train_bpe(
    input_path: str | Path,
    vocab_size: int,
    special_tokens: list[str],
    *,
    use_native_loop: bool | None = None,
) -> tuple[dict[int, bytes], list[tuple[bytes, bytes]]]:
    """Train with the exact-parity configuration; return ({id: bytes}, merges)."""
    config = BBPETrainerConfig(
        vocab_size=vocab_size,
        min_frequency=1,
        max_workers=1,
        chunk_size_bytes=1024 * 1024 * 1024,
        special_tokens=special_tokens,
        use_native_loop=use_native_loop,
    )
    model = BBPETrainer(config).train([Path(input_path)])
    return {v: k for k, v in model.vocab.items()}, model.merges
