"""Regenerate test fixtures the reference mount lacks (SURVEY.md §4.4).

The reference repo gitignores ``*.json`` and strips large blobs, so several
files its test suite needs are absent. All of them are reconstructible
offline:

- ``tests/fixtures_gpt2/gpt2_vocab.json``: rebuilt from ``gpt2_merges.txt``
  via the documented id assignment (byte tokens ordered by remap codepoint,
  merge concatenations in file order, ``<|endoftext|>`` last).
- ``tests/fixtures_gpt2/train-bpe-reference-vocab.json``: base vocab +
  special + the 243 fixture merges' concatenations (GPT-2 dialect).
- ``tests/fixtures_gpt2/golden_encode/*.json``: golden token ids for the
  conformance corpora, produced by running the *reference implementation*
  (mounted read-only) with the reconstructed GPT-2 vocab — the reference
  was itself verified token-identical to tiktoken's gpt2 encoding, and
  tiktoken cannot download its files in this sandbox.
- ``tests/data/large.txt``: any >1 KiB UTF-8 text (synthesized here).
- ``tests/fixtures_gpt2/tinystories_sample_5M.txt`` and the snapshot pickle
  for the 1000-vocab training run on it (reference trainer as oracle).

Run:  PYTHONPATH="src:/root/reference/src:$PYTHONPATH" python scripts/regen_fixtures.py
"""

from __future__ import annotations

import json
import pickle
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
FIX = REPO / "tests" / "fixtures_gpt2"
DATA = REPO / "tests" / "data"
SNAP = REPO / "tests" / "_snapshots"

sys.path.insert(0, str(REPO / "src"))
sys.path.insert(0, str(REF / "src"))

from yabpe_tpu.io import gpt2 as gpt2io  # noqa: E402


def build_gpt2_vocab() -> None:
    merges = gpt2io.load_gpt2_merges(REF / "tests/fixtures_gpt2/gpt2_merges.txt")
    vocab = gpt2io.reconstruct_gpt2_vocab(merges)
    assert len(vocab) == 50257, len(vocab)
    gpt2io.save_gpt2_vocab(FIX / "gpt2_vocab.json", vocab)
    print(f"gpt2_vocab.json: {len(vocab)} entries")


def build_train_reference_vocab() -> None:
    merges = gpt2io.load_gpt2_merges(
        REF / "tests/fixtures_gpt2/train-bpe-reference-merges.txt"
    )
    vocab: dict[bytes, int] = {}
    for b in range(256):
        vocab[bytes([b])] = b
    vocab["<|endoftext|>".encode()] = 256
    next_id = 257
    for left, right in merges:
        tok = left + right
        if tok not in vocab:
            vocab[tok] = next_id
            next_id += 1
    gpt2io.save_gpt2_vocab(FIX / "train-bpe-reference-vocab.json", vocab)
    print(f"train-bpe-reference-vocab.json: {len(vocab)} entries")


def build_large_txt() -> None:
    lines = []
    for i in range(200):
        lines.append(
            f"Line {i}: the quick brown fox jumps over the lazy dog; "
            f"Zahl {i * 7} — über ångström, naïve café, 東京 {i} 🚀\n"
        )
    (DATA / "large.txt").write_text("".join(lines), encoding="utf-8")
    print(f"large.txt: {(DATA / 'large.txt').stat().st_size} bytes")


def build_tinystories_5m() -> Path:
    out = FIX / "tinystories_sample_5M.txt"
    if out.exists() and out.stat().st_size > 4_900_000:
        print("tinystories_sample_5M.txt: exists")
        return out
    sample = (REF / "tests/fixtures_gpt2/tinystories_sample.txt").read_text(
        encoding="utf-8"
    )
    reps = (5 * 1024 * 1024) // len(sample.encode("utf-8")) + 1
    with open(out, "w", encoding="utf-8") as f:
        for _ in range(reps):
            f.write(sample)
    print(f"tinystories_sample_5M.txt: {out.stat().st_size} bytes")
    return out


def build_golden_encode() -> None:
    """Token-id oracles computed with the reference implementation."""
    from yet_another_bpe.tokenizer import BBPETokenizer as RefTok

    merges = gpt2io.load_gpt2_merges(REF / "tests/fixtures_gpt2/gpt2_merges.txt")
    vocab = gpt2io.load_gpt2_vocab(FIX / "gpt2_vocab.json")
    tok = RefTok(vocab=vocab, merges=merges, special_tokens=["<|endoftext|>"])
    tok_nospecial = RefTok(vocab=vocab, merges=merges, special_tokens=[])

    outdir = FIX / "golden_encode"
    outdir.mkdir(exist_ok=True)
    corpora = {
        "address": REF / "tests/fixtures_gpt2/address.txt",
        "german": REF / "tests/fixtures_gpt2/german.txt",
        "tinystories_sample": REF / "tests/fixtures_gpt2/tinystories_sample.txt",
        "special_trailing": REF
        / "tests/fixtures_gpt2/special_token_trailing_newlines.txt",
        "special_double": REF
        / "tests/fixtures_gpt2/special_token_double_newlines_non_whitespace.txt",
        "corpus_en": REF / "tests/fixtures_gpt2/corpus.en",
    }
    golden: dict[str, dict] = {}
    for name, path in corpora.items():
        text = path.read_text(encoding="utf-8")
        golden[name] = {
            "path": str(path),
            "with_special": tok.encode(text),
            "no_special": tok_nospecial.encode(text),
        }
    snippets = [
        "",
        "a",
        "hello world",
        "Héllò hôw are ü? 🙃",
        "    leading and trailing    ",
        "don't you dare 'tis 've 'll 're 's",
        "1234 56.78 ９８７",
        "mixed中文and日本語text",
        "<|endoftext|>",
        "a<|endoftext|>b<|endoftext|><|endoftext|>c",
        "line\r\nbreaks\r\r\n\n",
    ]
    golden["snippets"] = {
        "texts": snippets,
        "with_special": [tok.encode(s) for s in snippets],
        "no_special": [tok_nospecial.encode(s) for s in snippets],
    }
    with open(outdir / "gpt2_golden.json", "w") as f:
        json.dump(golden, f)
    total = sum(
        len(v["with_special"]) for k, v in golden.items() if k != "snippets"
    )
    print(f"golden_encode/gpt2_golden.json: {total} corpus tokens")


def build_train_snapshot(sample_5m: Path) -> None:
    """Snapshot oracle for the 5M-file 1000-vocab training run."""
    out = SNAP / "test_train_bpe_special_tokens.pkl"
    if out.exists():
        print("snapshot: exists")
        return
    from yet_another_bpe.trainer import BBPETrainer, BBPETrainerConfig

    cfg = BBPETrainerConfig(
        vocab_size=1000,
        min_frequency=1,
        max_workers=1,
        chunk_size_bytes=1 << 30,
        special_tokens=["<|endoftext|>"],
    )
    model = BBPETrainer(cfg).train([sample_5m])
    vocab_inv = {v: k for k, v in model.vocab.items()}
    payload = {
        "vocab_keys": set(vocab_inv.keys()),
        "vocab_values": set(vocab_inv.values()),
        "merges": model.merges,
    }
    with open(out, "wb") as f:
        pickle.dump(payload, f)
    print(
        f"snapshot: {len(vocab_inv)} vocab entries, {len(model.merges)} merges"
    )


def main() -> None:
    FIX.mkdir(parents=True, exist_ok=True)
    DATA.mkdir(parents=True, exist_ok=True)
    SNAP.mkdir(parents=True, exist_ok=True)
    build_gpt2_vocab()
    build_train_reference_vocab()
    build_large_txt()
    sample_5m = build_tinystories_5m()
    build_golden_encode()
    build_train_snapshot(sample_5m)


if __name__ == "__main__":
    main()
