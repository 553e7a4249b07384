"""Tokenizer benchmark workloads (mirrors the reference's harness: single
words, sentences, large files, cache behavior; plus device-batched and
parallel-file paths)."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))

from yabpe_tpu import BBPETokenizer  # noqa: E402
from yabpe_tpu.io import gpt2 as gpt2io  # noqa: E402


def main():
    from yabpe_tpu.utils import hostmem

    hostmem.warm_heap(512)  # pre-fault: this sandbox pages in lazily
    merges = gpt2io.load_gpt2_merges(
        "/root/reference/tests/fixtures_gpt2/gpt2_merges.txt"
    )
    vocab = gpt2io.load_gpt2_vocab(REPO / "tests/fixtures_gpt2/gpt2_vocab.json")
    tok = BBPETokenizer(vocab=vocab, merges=merges,
                        special_tokens=["<|endoftext|>"])

    words = ["tokenization", "hello", "antidisestablishmentarianism"] * 2000
    for w in words:
        tok.encode(w)  # warm-up: fill the cache
    t0 = time.perf_counter()
    for w in words:
        tok.encode(w)
    dt = time.perf_counter() - t0
    print(f"single words (cached): {len(words) / dt:.0f} words/s")

    sentence = "The quick brown fox jumps over the lazy dog. " * 10
    tok.encode(sentence)  # warm-up
    t0 = time.perf_counter()
    for _ in range(200):
        tok.encode(sentence)
    dt = time.perf_counter() - t0
    nb = len(sentence.encode()) * 200
    print(f"sentences: {nb / dt / 1e6:.2f} MB/s")

    five_m = REPO / "tests/fixtures_gpt2/tinystories_sample_5M.txt"
    if five_m.exists():
        text = five_m.read_text(encoding="utf-8")
        nb = len(text.encode())
        tok.clear_cache()
        t0 = time.perf_counter()
        ids = tok.encode(text)
        dt = time.perf_counter() - t0
        print(f"5MB serial (cold cache): {nb / dt / 1e6:.2f} MB/s "
              f"({len(ids)} tokens)")
        t0 = time.perf_counter()
        tok.encode(text)
        dt = time.perf_counter() - t0
        print(f"5MB serial (warm cache): {nb / dt / 1e6:.2f} MB/s")
        for workers in (1, 2, 4, 8):
            tok.encode_file(five_m, max_workers=workers)  # warm-up
            t0 = time.perf_counter()
            tok.encode_file(five_m, max_workers=workers)
            dt = time.perf_counter() - t0
            print(f"5MB parallel file x{workers}: {nb / dt / 1e6:.2f} MB/s")
        tok.encode_batch([text], device=True)  # warm-up: jit compile
        t0 = time.perf_counter()
        tok.encode_batch([text], device=True)
        dt = time.perf_counter() - t0
        print(f"5MB device-batched (warm): {nb / dt / 1e6:.2f} MB/s")
    print(f"cache: {tok.cache_info()}")


if __name__ == "__main__":
    main()
