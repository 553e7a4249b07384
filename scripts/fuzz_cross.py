"""Time-budgeted differential fuzzer: yabpe-tpu vs the upstream reference.

Generates random corpora (unicode edges, specials mid-text, contraction
suffixes, digit runs, emoji with modifiers, long whitespace runs), trains
both implementations with the identical parity config, and asserts
byte-identical merges; then round-trips and cross-checks encode on random
texts with the trained model AND the full GPT-2 model. Runs until the time
budget expires.

    python scripts/fuzz_cross.py [seconds=60] [seed=0]

The pytest suite pins a fixed handful of seeds (tests/test_reference_cross.py);
this script is the open-ended long-tail hunter.
"""

from __future__ import annotations

import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))
sys.path.insert(0, "/root/reference/src")

_WORDS = [
    "the", "cat", "sat", "Straße", "中文", "don't", "it's", "'ll", "'ve",
    "123", "42.5", "...", "!!", "👋🏽", "a", "b", "ab", "abc", "ÆØÅ",
    "नमस्ते", "🇯🇵", "é", "‍", "ﬁ", "Ⅻ", "¼", "︎꧄", "𠀋",
]
_SEPS = [" ", "  ", "\n", "\n\n", "\t", " \n ", "\r\n", "　", ""]
_SPECIALS = ["<|endoftext|>", "<|eot|>", "<|endoftext|><|endoftext|>"]


def random_corpus(rng: random.Random) -> tuple[str, list[str]]:
    n_specials = rng.randint(0, len(_SPECIALS))
    specials = rng.sample(_SPECIALS, n_specials) or ["<|endoftext|>"]
    parts = []
    for _ in range(rng.randint(5, 120)):
        n = rng.randint(1, 12)
        parts.append(rng.choice(_SEPS).join(
            rng.choice(_WORDS) for _ in range(n)))
        if rng.random() < 0.25:
            parts.append(rng.choice(specials))
        parts.append(rng.choice(_SEPS))
    return "".join(parts), specials


def main() -> int:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    import tempfile

    import yet_another_bpe as ref

    from yabpe_tpu import BBPETokenizer, BBPETrainer, BBPETrainerConfig
    from yabpe_tpu.io import gpt2 as gpt2io

    gpt2_merges = gpt2io.load_gpt2_merges(
        "/root/reference/tests/fixtures_gpt2/gpt2_merges.txt"
    )
    gpt2_vocab = gpt2io.load_gpt2_vocab(
        REPO / "tests/fixtures_gpt2/gpt2_vocab.json"
    )
    ours_gpt2 = BBPETokenizer(
        vocab=gpt2_vocab, merges=gpt2_merges, special_tokens=["<|endoftext|>"]
    )
    ref_gpt2 = ref.BBPETokenizer(
        vocab=gpt2_vocab, merges=gpt2_merges, special_tokens=["<|endoftext|>"]
    )

    deadline = time.monotonic() + budget
    case = 0
    while time.monotonic() < deadline:
        seed = seed0 + case
        rng = random.Random(seed)
        text, specials = random_corpus(rng)

        with tempfile.TemporaryDirectory() as td:
            corpus = Path(td) / "c.txt"
            corpus.write_text(text, encoding="utf-8")
            vocab_size = rng.choice([260, 300, 400, 700])
            min_freq = rng.choice([1, 1, 2])

            ours = BBPETrainer(BBPETrainerConfig(
                vocab_size=vocab_size, min_frequency=min_freq,
                max_workers=1, chunk_size_bytes=1 << 30,
                special_tokens=specials,
            )).train([corpus])
            theirs = ref.BBPETrainer(ref.BBPETrainerConfig(
                vocab_size=vocab_size, min_frequency=min_freq,
                max_workers=1, chunk_size_bytes=1 << 30,
                special_tokens=specials,
            )).train([corpus])
            assert ours.merges == theirs.merges, (
                f"MERGE MISMATCH seed={seed} vocab={vocab_size} "
                f"min_freq={min_freq} specials={specials}"
            )

            ours_tok = BBPETokenizer(
                vocab=ours.vocab, merges=ours.merges, special_tokens=specials
            )
            ref_tok = ref.BBPETokenizer(
                vocab=theirs.vocab, merges=theirs.merges,
                special_tokens=specials,
            )
            for _ in range(4):
                sample, _ = random_corpus(rng)
                a = ours_tok.encode(sample)
                b = ref_tok.encode(sample)
                assert a == b, f"ENCODE MISMATCH (trained) seed={seed}"
                assert ours_tok.decode(a) == sample
                g1 = ours_gpt2.encode(sample)
                g2 = ref_gpt2.encode(sample)
                assert g1 == g2, f"ENCODE MISMATCH (gpt2) seed={seed}"
        case += 1
        if case % 10 == 0:
            print(f"{case} cases OK ({deadline - time.monotonic():.0f}s left)",
                  flush=True)

    print(f"fuzz_cross: {case} randomized cases, 0 mismatches")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
