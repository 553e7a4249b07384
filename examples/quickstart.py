"""Quickstart: train, save, load, encode, decode — end to end.

    python examples/quickstart.py [corpus.txt ...]

Defaults to the bundled sample corpus. Mirrors the README usage section;
also exercises the batched device path and the parallel file encoder.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))

from yabpe_tpu import BBPETokenizer, BBPETrainer, BBPETrainerConfig  # noqa: E402


def main() -> int:
    files = sys.argv[1:] or [str(REPO / "tests" / "data" / "sample.txt")]

    cfg = BBPETrainerConfig(
        vocab_size=500,
        min_frequency=1,
        special_tokens=["<|endoftext|>"],
    )
    trainer = BBPETrainer(cfg)
    model = trainer.train(files)
    print(f"trained: {len(model.vocab)} vocab entries, "
          f"{len(model.merges)} merges")

    with tempfile.TemporaryDirectory() as td:
        trainer.save(td)
        tok = BBPETokenizer.from_file(td)

    text = "Hello world<|endoftext|>naïve café 👋"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    print(f"encode({text!r}) -> {ids}")

    batch = tok.encode_batch(["first text", "second text"], device=True)
    print(f"device-batched: {[len(b) for b in batch]} ids per text")

    file_ids = tok.encode_file(files[0])
    print(f"encode_file({files[0]}): {len(file_ids)} ids "
          f"(exact, pretoken-safe parallel)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
