"""HBM-tiled fused merge-loop kernel (kernels/hbm_loop) correctness.

Interpret-mode tests run the REAL kernel logic (DMA semantics included)
on the CPU backend; the on-chip compile/parity path is exercised by
YABPE_TEST_TPU=1 runs and the bench harness.
"""

from __future__ import annotations

import numpy as np
import pytest

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.train import state as train_state
from yabpe_tpu.train.hbm_driver import (
    hbm_applicable,
    initial_corner_counts,
    pack_words,
    run_hbm_merge_loop,
)
from yabpe_tpu.train.reference_loop import train_merges_oracle

from .common import REF_FIXTURES


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    from yabpe_tpu.pretok.ingest import count_pretokens

    text = (
        "the quick brown fox jumps over the lazy dog. "
        "the dog barks, the fox runs away! banana bandana anagrams "
        "low lower lowest newer newest wider widest 123 4567 \n\n"
    ) * 6 + "naïve café 東京 😀 mixed UP case WORDS"
    f = tmp_path_factory.mktemp("hbm") / "small.txt"
    f.write_text(text, encoding="utf-8")
    counter = count_pretokens([f], ["<|endoftext|>"], max_workers=1)
    base = Vocab.base(["<|endoftext|>"])
    return counter, WordTable.from_counter(counter), base


def test_pack_words_roundtrip(small_corpus):
    _, wt, _ = small_corpus
    packed = pack_words(wt)
    n, w = wt.words.shape
    w = max(w, 2)
    nr = packed.shape[0]
    cols = (
        packed.reshape(nr, w + 2, 128)
        .transpose(0, 2, 1)
        .reshape(nr * 128, w + 2)
    )
    syms = cols[:n, : wt.words.shape[1]].astype(np.int32)
    assert np.array_equal(syms, wt.words)
    lo = cols[:n, w].view(np.uint16).astype(np.int64)
    hi = cols[:n, w + 1].view(np.uint16).astype(np.int64)
    assert np.array_equal(lo | (hi << 16), wt.freqs.astype(np.int64))
    # padding rows are empty with zero frequency
    assert (cols[n:, : w] == -1).all()


def test_initial_corner_counts_matches_dense(small_corpus):
    _, wt, base = small_corpus
    b0 = len(list(base.tokens()))
    corner = initial_corner_counts(wt, b0)
    from yabpe_tpu.kernels.pair_count import pair_counts_dense

    dense = np.asarray(
        pair_counts_dense(wt.words, wt.freqs.astype(np.int32), b0)
    ).reshape(b0, b0)
    assert np.array_equal(corner, dense)


def test_hbm_applicable_bounds():
    from yabpe_tpu.train.hbm_driver import hbm_mode

    assert hbm_mode(100_000, 32, 32768, 32) == "vmem"
    # u16 bit-pattern ids carry vocabularies past i16 range (GPT-2 scale)
    assert hbm_applicable(100_000, 32, 50_257, 32)
    assert not hbm_applicable(100_000, 32, 63_489, 32)
    assert not hbm_applicable(100_000, 80, 32768, 80)
    # word table past the VMEM plan -> streamed-from-HBM mode (the 1 GB
    # north-star shape: ~3.9M uniques, width 16)
    assert hbm_mode(3_900_000, 16, 32768, 16) == "hbm"
    # VMEM plan blown even in streaming mode (flags/token at 10M x W64)
    assert not hbm_applicable(10_000_000, 64, 32768, 64)


@pytest.mark.parametrize(
    "vocab_size,min_freq",
    [(300, 1), pytest.param(280, 3, marks=pytest.mark.slow)],
)
def test_hbm_kernel_matches_oracle_interpret(
    small_corpus, vocab_size, min_freq
):
    counter, wt, base = small_corpus
    num = vocab_size - len(list(base.tokens()))
    merges_ids = run_hbm_merge_loop(
        wt,
        base,
        vocab_cap=vocab_size,
        num_merges=num,
        min_frequency=min_freq,
        chunk_size=16,
        interpret=True,
    )
    _, merges = train_state.merges_to_bytes(merges_ids, base)
    _, want = train_merges_oracle(
        counter, ["<|endoftext|>"], vocab_size, min_freq
    )
    assert merges == want


@pytest.mark.slow
def test_hbm_kernel_early_stop_interpret(small_corpus):
    """A min_frequency no pair reaches must stop with zero merges."""
    counter, wt, base = small_corpus
    merges_ids = run_hbm_merge_loop(
        wt,
        base,
        vocab_cap=400,
        num_merges=50,
        min_frequency=10**9,
        chunk_size=8,
        interpret=True,
    )
    assert (merges_ids == -1).all()


@pytest.mark.chip
@pytest.mark.skipif(
    __import__("os").environ.get("YABPE_TEST_TPU", "0") != "1",
    reason="real-chip compile (set YABPE_TEST_TPU=1)",
)
def test_hbm_kernel_golden_fixture_tpu():
    from yabpe_tpu.io import gpt2 as gpt2io
    from yabpe_tpu.pretok.ingest import count_pretokens

    counter = count_pretokens(
        [REF_FIXTURES / "corpus.en"], ["<|endoftext|>"], max_workers=1
    )
    base = Vocab.base(["<|endoftext|>"])
    wt = WordTable.from_counter(counter)
    merges_ids = run_hbm_merge_loop(
        wt, base, vocab_cap=500, num_merges=243,
        min_frequency=1, chunk_size=64,
    )
    _, merges = train_state.merges_to_bytes(merges_ids, base)
    ref = gpt2io.load_gpt2_merges(
        REF_FIXTURES / "train-bpe-reference-merges.txt"
    )
    assert merges == ref


@pytest.mark.parametrize(
    "vocab_size,min_freq",
    [(300, 1), pytest.param(280, 3, marks=pytest.mark.slow)],
)
def test_hbm_kernel_words_in_hbm_interpret(small_corpus, vocab_size, min_freq):
    """Streaming-scan (words-in-HBM) mode must match the oracle exactly:
    the mode the 1 GB corpus runs in, forced here onto a small table."""
    counter, wt, base = small_corpus
    num = vocab_size - len(list(base.tokens()))
    merges_ids = run_hbm_merge_loop(
        wt,
        base,
        vocab_cap=vocab_size,
        num_merges=num,
        min_frequency=min_freq,
        chunk_size=16,
        interpret=True,
        force_words_in_hbm=True,
    )
    _, merges = train_state.merges_to_bytes(merges_ids, base)
    _, want = train_merges_oracle(
        counter, ["<|endoftext|>"], vocab_size, min_freq
    )
    assert merges == want


@pytest.mark.slow
def test_hbm_kernel_dense_affected_interpret():
    """Thousands of words sharing the merged pair: exercises multi-batch
    gathers, words sharing a packed row (lane-class blended write-back),
    and window-boundary batch breaks."""
    from collections import Counter

    counter = Counter()
    for i in range(2000):
        counter[f" ab{i % 97}x{i}".encode()] = (i % 13) + 1
    base = Vocab.base([])
    wt = WordTable.from_counter(counter)
    merges_ids = run_hbm_merge_loop(
        wt,
        base,
        vocab_cap=320,
        num_merges=64,
        min_frequency=1,
        chunk_size=16,
        interpret=True,
    )
    _, merges = train_state.merges_to_bytes(merges_ids, base)
    _, want = train_merges_oracle(counter, [], 320, 1)
    assert merges == want


@pytest.mark.slow
def test_hbm_kernel_multislab_evictions_interpret():
    """Multi-slab vocab (V=4096) + >128 distinct pending columns: forces
    the pending-column accumulator through slot-exhaustion evictions and
    exercises the per-row pending-positive bound (a row RMW while that
    row holds pending column increments under-bounded row_max before the
    fix)."""
    from collections import Counter

    rng = np.random.default_rng(3)
    counter = Counter()
    for _ in range(2500):
        w = "".join(
            chr(97 + int(x))
            for x in rng.integers(0, 9, int(rng.integers(2, 10)))
        )
        counter[(" " + w).encode()] += int(rng.integers(1, 50))
    base = Vocab.base([])
    wt = WordTable.from_counter(counter)
    num = 180  # > 128 new columns -> at least one eviction
    merges_ids = run_hbm_merge_loop(
        wt,
        base,
        vocab_cap=4096,
        num_merges=num,
        min_frequency=1,
        chunk_size=64,
        interpret=True,
    )
    _, merges = train_state.merges_to_bytes(merges_ids, base)
    _, want = train_merges_oracle(counter, [], 256 + num, 1)
    assert merges == want[:num]


# ------------------------------------------------------- checkpoint/resume


@pytest.mark.slow
def test_hbm_kernel_resume_replay_interpret(small_corpus):
    """Resume via in-kernel replay must reproduce the full run exactly,
    including resume points that are not chunk-aligned."""
    _, wt, base = small_corpus
    kw = dict(
        vocab_cap=300, num_merges=44, min_frequency=1, chunk_size=16,
        interpret=True,
    )
    full = run_hbm_merge_loop(wt, base, **kw)
    for steps_done in (16, 21, 44):
        ck = np.full_like(full, -1)
        ck[:steps_done] = full[:steps_done]
        resumed = run_hbm_merge_loop(
            wt, base, resume=(ck, steps_done), **kw
        )
        assert np.array_equal(resumed, full), f"diverged at {steps_done}"


def test_hbm_checkpoint_resume_trainer(tmp_path):
    """Kill-and-resume through the FORCED HBM engine produces the
    identical model (checkpoint_dir no longer demotes the kernel)."""
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig
    from yabpe_tpu.train import checkpoint as ckpt

    f = tmp_path / "c.txt"
    f.write_text(
        "the cat sat on the mat. the bat and the rat ran. " * 40,
        encoding="utf-8",
    )
    kw = dict(
        vocab_size=300,
        min_frequency=1,
        max_workers=1,
        special_tokens=[],
        merge_chunk_size=16,
        use_hbm_kernel=True,
        use_native_loop=False,
        use_fused_kernel=False,
    )
    full = BBPETrainer(BBPETrainerConfig(**kw)).train([f])

    ckdir = tmp_path / "ck"
    cfg = BBPETrainerConfig(
        **kw, checkpoint_dir=str(ckdir), checkpoint_every_chunks=1
    )
    BBPETrainer(cfg).train([f])
    loaded = ckpt.load_checkpoint(ckdir, cfg)
    assert loaded is not None
    merges_ids, _ = loaded
    truncated = np.full_like(merges_ids, -1)
    truncated[:20] = merges_ids[:20]
    ckpt.save_checkpoint(ckdir, truncated, 20, cfg)

    resumed = BBPETrainer(cfg).train([f])
    assert resumed.merges == full.merges
    assert resumed.vocab == full.vocab


# -------------------------------------------------------------- routing


def test_forced_hbm_unfit_raises(tmp_path):
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    f = tmp_path / "c.txt"
    f.write_text("tiny corpus " * 20, encoding="utf-8")
    cfg = BBPETrainerConfig(
        vocab_size=63_500,  # past the 63,488 u16/slab-bitmask cap
        min_frequency=1,
        use_hbm_kernel=True,
        use_native_loop=False,  # tiny corpora otherwise take the C++ loop
        max_pair_table_bytes=1 << 44,
    )
    with pytest.raises(ValueError, match="exceeds the HBM"):
        BBPETrainer(cfg).train([f])


def test_hbm_routing_unit(monkeypatch, small_corpus):
    """Auto routing: on TPU when applicable, never under checkpoint_dir,
    never when disabled, on CPU only by explicit force."""
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig
    from yabpe_tpu.utils import jaxsetup

    _, wt, _ = small_corpus
    monkeypatch.setattr(jaxsetup, "effective_backend", lambda: "tpu")
    tr = BBPETrainer(BBPETrainerConfig(vocab_size=4096, min_frequency=1))
    assert tr._should_use_hbm(wt, 4096)
    assert not tr._should_use_hbm(wt, 65536)  # past i16 vocab bound

    # checkpointed runs stay on the HBM engine (resume = in-kernel replay)
    tr = BBPETrainer(
        BBPETrainerConfig(
            vocab_size=4096, min_frequency=1, checkpoint_dir="/tmp/x"
        )
    )
    assert tr._should_use_hbm(wt, 4096)

    tr = BBPETrainer(
        BBPETrainerConfig(
            vocab_size=4096, min_frequency=1, use_hbm_kernel=False
        )
    )
    assert not tr._should_use_hbm(wt, 4096)

    monkeypatch.setattr(jaxsetup, "effective_backend", lambda: "cpu")
    tr = BBPETrainer(BBPETrainerConfig(vocab_size=4096, min_frequency=1))
    assert not tr._should_use_hbm(wt, 4096)
    tr = BBPETrainer(
        BBPETrainerConfig(
            vocab_size=4096, min_frequency=1, use_hbm_kernel=True
        )
    )
    assert tr._should_use_hbm(wt, 4096)


def test_native_routing_large_corpus_stays_on_host():
    """Auto routing keeps 1 GB-scale problems on the C++ host loop.

    Regression guard: an earlier ``num_merges * 8 * n_unique < 3e11``
    threshold sent corpora past ~1.2M unique words to the device engines
    — which became reachable once round 4 lifted the HBM kernel's
    admission caps, silently trading the ~6-9 s native 1 GB run for the
    ~260 s streaming-mode kernel. Measured per-step costs (PERFORMANCE.md)
    say the host wins every feasible single-chip auto workload.
    """
    from yabpe_tpu import native
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    if not native.available():
        pytest.skip("native library unavailable")
    tr = BBPETrainer(BBPETrainerConfig(vocab_size=32000, min_frequency=2))
    # the 1 GB bench shape (~1M-4M uniques) and a far larger one
    assert tr._should_use_native_loop(1_200_000, 31744)
    assert tr._should_use_native_loop(4_000_000, 31744)
    # forced-off and distributed runs still leave the host loop
    tr = BBPETrainer(
        BBPETrainerConfig(
            vocab_size=32000, min_frequency=2, use_native_loop=False
        )
    )
    assert not tr._should_use_native_loop(1_200_000, 31744)
    tr = BBPETrainer(
        BBPETrainerConfig(vocab_size=32000, min_frequency=2, data_shards=2)
    )
    assert not tr._should_use_native_loop(1_200_000, 31744)


def _mini_merge_oracle(words, freqs, tokens, num_merges, min_frequency):
    """Direct-from-table reference merge loop (reference semantics:
    /root/reference/src/yet_another_bpe/trainer.py:216-302) for problems
    whose base vocab is not expressible as bytes+specials (wide-id test)."""
    tokens = list(tokens)
    tok2id = {t: i for i, t in enumerate(tokens)}
    words = [list(w) for w in words]
    out = []
    for _ in range(num_merges):
        counts: dict[tuple[int, int], int] = {}
        for w, f in zip(words, freqs):
            for x, y in zip(w, w[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            break
        (a, b), cnt = max(
            counts.items(),
            key=lambda kv: (kv[1], tokens[kv[0][0]], tokens[kv[0][1]]),
        )
        if cnt < max(min_frequency, 1):
            break
        merged = tokens[a] + tokens[b]
        c = tok2id.get(merged)
        if c is None:
            c = len(tokens)
            tokens.append(merged)
            tok2id[merged] = c
        out.append((a, b, c))
        for i, w in enumerate(words):
            j, nw = 0, []
            while j < len(w):
                if j + 1 < len(w) and w[j] == a and w[j + 1] == b:
                    nw.append(c)
                    j += 2
                else:
                    nw.append(w[j])
                    j += 1
            words[i] = nw
    return out


@pytest.mark.slow
@pytest.mark.slow
def test_hbm_wide_vocab_u16_ids_interpret():
    """Vocabularies past i16 (GPT-2's 50,257 regime): symbol ids >= 32768
    stored as u16 bit patterns must train byte-exactly. A synthetic
    33,000-token base vocab puts wide ids in play from step one."""
    from yabpe_tpu.train.hbm_driver import hbm_mode

    rng = np.random.default_rng(11)
    b0 = 33_000
    base = Vocab()
    for i in range(b0):
        # distinct 3-byte strings, lexicographically varied
        base.add(bytes([i % 251, (i // 251) % 251, 7 + i % 13]))
    tokens = list(base.tokens())
    assert len(tokens) == b0

    n_words = 600
    word_rows = []
    freqs = []
    for _ in range(n_words):
        ln = int(rng.integers(2, 7))
        # cluster ids so pairs repeat (and many ids sit >= 32768)
        word_rows.append(
            [int(32_700 + rng.integers(0, 280)) for _ in range(ln)]
        )
        freqs.append(int(rng.integers(1, 9)))
    width = 16
    words_np = np.full((1024, width), -1, dtype=np.int32)
    freqs_np = np.zeros((1024,), dtype=np.int64)
    for i, (w, f) in enumerate(zip(word_rows, freqs)):
        words_np[i, : len(w)] = w
        freqs_np[i] = f
    wt = WordTable(
        words=words_np, freqs=freqs_np, num_words=n_words, max_len=width
    )

    num = 24
    vocab_cap = b0 + num
    assert hbm_mode(n_words, width, vocab_cap, 3) is not None
    ids = run_hbm_merge_loop(
        wt, base, vocab_cap=vocab_cap, num_merges=num, min_frequency=1,
        chunk_size=num, interpret=True,
    )
    got = [tuple(r) for r in ids if r[0] >= 0]
    want = _mini_merge_oracle(word_rows, freqs, tokens, num, 1)
    assert got == want


@pytest.mark.slow
def test_hbm_big_counts_two_limb_exact():
    """Pair counts far beyond 2^24 (the single-f32 exactness bound) stay
    byte-exact through the two-limb pending-column accumulator — the
    regime the 1 GB north-star corpus hits (max pair count ~18.7M)."""
    from collections import Counter

    counter = Counter(
        {
            b" aab": (1 << 24) + 12345,   # pair counts ~16.8M
            b" aac": (1 << 23) + 7,
            b" bcbc": (1 << 22) + 3,
            b" abcabc": 1023,
            b" xyzw": 5,
        }
    )
    base = Vocab.base([])
    wt = WordTable.from_counter(counter)
    merges_ids = run_hbm_merge_loop(
        wt, base, vocab_cap=280, num_merges=16, min_frequency=1,
        chunk_size=4, interpret=True,
    )
    _, merges = train_state.merges_to_bytes(merges_ids, base)
    _, want = train_merges_oracle(counter, [], 256 + 16, 1)
    assert merges == want[:16]


def test_trainer_falls_back_when_hbm_unsupported(tmp_path, monkeypatch):
    """Training must complete (via the XLA engines) when the HBM kernel
    rejects the problem at runtime, and still match the oracle."""
    from collections import Counter

    from yabpe_tpu import BBPETrainer, BBPETrainerConfig
    from yabpe_tpu.train import hbm_driver, trainer as trainer_mod
    from yabpe_tpu.utils import jaxsetup

    monkeypatch.setattr(jaxsetup, "effective_backend", lambda: "tpu")

    def _boom(*a, **k):
        raise hbm_driver.HbmKernelUnsupported("forced by test")

    monkeypatch.setattr(hbm_driver, "run_hbm_merge_loop", _boom)

    text = "abra cadabra abra abra cad " * 30
    f = tmp_path / "c.txt"
    f.write_text(text, encoding="utf-8")
    model = BBPETrainer(
        BBPETrainerConfig(
            vocab_size=280,
            min_frequency=1,
            use_native_loop=False,
            use_fused_kernel=False,  # isolate the hbm -> bigvocab route
        )
    ).train([f])

    from yabpe_tpu.pretok.ingest import count_pretokens

    counter = count_pretokens([f], [], max_workers=1)
    _, want = train_merges_oracle(counter, [], 280, 1)
    assert model.merges == want
