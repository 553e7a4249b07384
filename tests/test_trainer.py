"""Tier-1/2 trainer tests: merge-loop semantics, orchestration, persistence."""

from __future__ import annotations

import json
import random
from collections import Counter
from pathlib import Path

import pytest

from yabpe_tpu import BBPEModel, BBPETrainer, BBPETrainerConfig
from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.train.reference_loop import train_merges_oracle
from yabpe_tpu.train.state import init_state, merge_chunk, merges_to_bytes

from .common import DATA


def _device_merges(counter, specials, vocab_size, min_frequency=1):
    import jax.numpy as jnp
    import numpy as np

    base = Vocab.base(specials)
    wt = WordTable.from_counter(counter)
    cap = max(vocab_size, len(base))
    num = max(0, vocab_size - len(base))
    if num == 0:
        return base, []
    st = init_state(wt, base, cap, num)
    start = 0
    while start < num:
        st = merge_chunk(
            st,
            jnp.asarray(start, jnp.int32),
            vocab_cap=cap,
            min_frequency=min_frequency,
            num_merges=num,
            chunk_size=64,
        )
        start += 64
        if bool(st.stopped):
            break
    return merges_to_bytes(np.asarray(st.merges), base)


# ----------------------------------------------------------- merge semantics


def test_base_vocab_layout():
    v = Vocab.base(["[PAD]", "[UNK]"])
    assert len(v) == 258
    for b in range(256):
        assert v.id_of(bytes([b])) == b
    assert v.id_of(b"[PAD]") == 256
    assert v.id_of(b"[UNK]") == 257


def test_base_vocab_duplicate_special():
    # Specials whose bytes equal an existing token are skipped, so
    # single-character ASCII specials never get fresh ids.
    v = Vocab.base(["A", "B", "A"])
    assert len(v) == 256
    assert v.id_of(b"A") == 65
    v2 = Vocab.base(["[X]", "[X]", "[Y]"])
    assert len(v2) == 258
    assert v2.id_of(b"[X]") == 256


def test_frequency_ordering():
    counter = Counter({b"ab": 10, b"cd": 3})
    _, merges = _device_merges(counter, [], 258)
    assert merges == [(b"a", b"b"), (b"c", b"d")]


def test_lexicographic_tiebreak():
    counter = Counter({b"ab": 5, b"cd": 5, b"zy": 5})
    _, merges = _device_merges(counter, [], 257)
    assert merges == [(b"z", b"y")]


def test_vocab_size_cap_exact_merges():
    counter = Counter({b"abcdef": 100})
    vocab, merges = _device_merges(counter, [], 260)
    assert len(merges) == 4
    assert len(vocab) == 260


def test_min_frequency_stop():
    counter = Counter({b"ab": 5, b"cd": 1})
    _, merges = _device_merges(counter, [], 300, min_frequency=2)
    assert merges == [(b"a", b"b")]


def test_pairs_exhausted_stop():
    counter = Counter({b"ab": 2})
    _, merges = _device_merges(counter, [], 300)
    assert merges == [(b"a", b"b")]


def test_dedup_merge_reuses_id():
    # "abc" can form via (ab, c) after (a, b); constructing a second path to
    # the same bytes exercises the already-in-vocab branch.
    counter = Counter({b"abc": 10, b"ab": 6, b"bc": 5, b"zabc": 4})
    vocab, merges = _device_merges(counter, [], 264)
    oracle_vocab, oracle_merges = train_merges_oracle(counter, [], 264, 1)
    assert merges == oracle_merges
    assert vocab.as_bytes_to_id() == oracle_vocab.as_bytes_to_id()


def test_special_tokens_participate_as_raw_bytes():
    # Specials enter training statistics as whole pre-tokens of raw bytes.
    counter = Counter({b"<|eot|>": 50, b"hi": 3})
    _, merges = _device_merges(counter, ["<|eot|>"], 259)
    oracle_vocab, oracle_merges = train_merges_oracle(counter, ["<|eot|>"], 259, 1)
    assert merges == oracle_merges
    # All six adjacent pairs inside "<|eot|>" tie at count 50; the
    # lexicographically greatest tuple is ("|", "e").
    assert merges[0] == (b"|", b"e")


@pytest.mark.parametrize("seed", range(5))
def test_device_loop_matches_oracle_random(seed):
    """Property test: device loop == host oracle on random corpora."""
    rng = random.Random(seed)
    alphabet = "abcdeé 東!"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(rng.randint(5, 60))
    ]
    counter = Counter()
    for w in words:
        counter[w.encode("utf-8")] += rng.randint(1, 9)
    vocab_size = 256 + rng.randint(1, 60)
    dev_vocab, dev_merges = _device_merges(counter, [], vocab_size)
    or_vocab, or_merges = train_merges_oracle(counter, [], vocab_size, 1)
    assert dev_merges == or_merges
    assert dev_vocab.as_bytes_to_id() == or_vocab.as_bytes_to_id()


def test_matmul_count_strategy_matches(tmp_path: Path):
    p = tmp_path / "c.txt"
    p.write_text("the quick brown fox jumps over the lazy dog " * 40)
    kw = dict(
        vocab_size=300,
        min_frequency=1,
        max_workers=1,
        special_tokens=[],
        # Force the XLA device path: the native host loop would ignore
        # count_strategy entirely and make this test vacuous.
        use_native_loop=False,
        use_fused_kernel=False,
    )
    dense = BBPETrainer(BBPETrainerConfig(**kw, count_strategy="dense")).train([p])
    matmul = BBPETrainer(BBPETrainerConfig(**kw, count_strategy="matmul")).train([p])
    auto = BBPETrainer(BBPETrainerConfig(**kw, count_strategy="auto")).train([p])
    assert dense.merges == matmul.merges
    assert dense.vocab == matmul.vocab
    assert dense.merges == auto.merges


def test_count_strategy_resolution_and_guard():
    """"auto" resolution rules and the matmul 2**24 exactness guard."""
    from yabpe_tpu.train.state import (
        MATMUL_EXACT_BOUND,
        max_possible_pair_count,
        resolve_count_strategy,
    )

    small = WordTable.from_counter(Counter({b"ab": 3, b"abc": 2}))
    assert max_possible_pair_count(small) == 3 + 2 * 2
    assert resolve_count_strategy("dense", small, 500, "tpu") == "dense"
    assert resolve_count_strategy("auto", small, 500, "tpu") == "matmul"
    assert resolve_count_strategy("auto", small, 500, "cpu") == "dense"
    assert resolve_count_strategy("auto", small, 32768, "tpu") == "dense"
    assert resolve_count_strategy("matmul", small, 500, "cpu") == "matmul"

    # A corpus whose pair-count bound reaches 2**24 must never run matmul.
    big = WordTable.from_counter(Counter({b"ab": MATMUL_EXACT_BOUND}))
    assert resolve_count_strategy("auto", big, 500, "tpu") == "dense"
    with pytest.raises(ValueError, match="not exact"):
        resolve_count_strategy("matmul", big, 500, "tpu")
    with pytest.raises(ValueError, match="unknown count_strategy"):
        resolve_count_strategy("bogus", small, 500, "tpu")


# ----------------------------------------------------------- orchestration


def test_train_requires_files():
    with pytest.raises(ValueError):
        BBPETrainer().train([])


def test_train_missing_file():
    with pytest.raises(FileNotFoundError):
        BBPETrainer().train(["/no/such/corpus.txt"])


def test_train_empty_corpus(tmp_path: Path):
    p = tmp_path / "empty.txt"
    p.write_text("")
    model = BBPETrainer(BBPETrainerConfig(special_tokens=["[PAD]"])).train([p])
    assert isinstance(model, BBPEModel)
    assert len(model.vocab) == 257
    assert model.merges == []


def test_train_multiple_files(tmp_path: Path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("aaa bbb " * 20)
    b.write_text("aaa ccc " * 20)
    combined = tmp_path / "ab.txt"
    combined.write_text(a.read_text() + b.read_text())
    cfg = dict(vocab_size=280, min_frequency=1, max_workers=2, special_tokens=[])
    two = BBPETrainer(BBPETrainerConfig(**cfg)).train([a, b])
    one = BBPETrainer(BBPETrainerConfig(**cfg)).train([combined])
    assert two.merges == one.merges


def test_auto_speculation_regime_boundary(monkeypatch, tmp_path: Path):
    """spec_merges_per_round=0 (auto) turns speculative epochs ON only
    under multi-process jax.distributed: cross-host collectives cost
    ~100us-10ms so epoch amortization wins there, while a single-host
    multi-chip mesh rides ICI (~10-20us/collective) where the lockstep
    loop is already latency-cheap (BBPETrainerConfig docs state this
    boundary; this pins it)."""
    from yabpe_tpu.dist import sharded as sharded_mod
    from yabpe_tpu.train import trainer as trainer_mod

    p = tmp_path / "c.txt"
    p.write_text("spam ham eggs " * 200, encoding="utf-8")
    seen = {}

    real = sharded_mod.run_sharded_merge_loop

    def spy(*args, **kw):
        seen["spec_batch"] = kw.get("spec_batch")
        return real(*args, **kw)

    monkeypatch.setattr(sharded_mod, "run_sharded_merge_loop", spy)
    cfg = BBPETrainerConfig(
        vocab_size=280, min_frequency=1, special_tokens=[],
        data_shards=2, use_native_loop=False,
    )
    # single host (jax.process_count() == 1): auto keeps lockstep
    BBPETrainer(cfg).train([p])
    assert seen["spec_batch"] == 0

    # multi-process: auto turns epochs on
    monkeypatch.setattr(
        trainer_mod.BBPETrainer, "_multihost", lambda self: True
    )
    BBPETrainer(cfg).train([p])
    assert seen["spec_batch"] == 16


def test_numpy_backend_matches_jax():
    sample = DATA / "sample.txt"
    kw = dict(vocab_size=300, min_frequency=1, max_workers=1, special_tokens=[])
    jx = BBPETrainer(BBPETrainerConfig(**kw, backend="jax")).train([sample])
    np_ = BBPETrainer(BBPETrainerConfig(**kw, backend="numpy")).train([sample])
    assert jx.merges == np_.merges
    assert jx.vocab == np_.vocab


# ------------------------------------------------------------- persistence


def test_save_before_train(tmp_path: Path):
    with pytest.raises(ValueError):
        BBPETrainer().save(tmp_path)


def test_save_creates_valid_files(tmp_path: Path):
    cfg = BBPETrainerConfig(
        vocab_size=280, min_frequency=1, special_tokens=["[PAD]", "[UNK]"]
    )
    tr = BBPETrainer(cfg)
    model = tr.train([DATA / "sample.txt"])
    out = tmp_path / "model"
    tr.save(out)

    vocab_json = json.loads((out / "vocab.json").read_text(encoding="utf-8"))
    assert len(vocab_json) == len(model.vocab)
    specials = json.loads((out / "special_tokens.json").read_text())
    assert specials == ["[PAD]", "[UNK]"]
    lines = (out / "merges.txt").read_text(encoding="utf-8").splitlines()
    assert len(lines) == len(model.merges)


def test_save_merges_format_tolerance(tmp_path: Path):
    """Saved merges.txt lines must parse with first-space splitting even
    when tokens themselves contain spaces, and loading must not crash.

    Reference analogue: /root/reference/tests/test_trainer.py:593-604
    (the merges format accepts 1-or-2-part lines; space-containing tokens
    are handled with maxsplit=1). Note the format genuinely cannot
    round-trip a leading-space token — " " + " " serializes to three
    spaces and loads as (b"", b"  ") — a documented hazard the reference
    accepts identically; exact round-trips use the GPT-2 dialect.
    """
    # Whitespace-heavy corpus: merges like (b" ", b" ") produce tokens
    # containing spaces, the format's hard case.
    p = tmp_path / "spacey.txt"
    p.write_text(("word" + " " * 7) * 200 + "tail")
    cfg = BBPETrainerConfig(vocab_size=280, min_frequency=1, special_tokens=[])
    tr = BBPETrainer(cfg)
    model = tr.train([p])
    assert any(
        b" " in left or b" " in right for left, right in model.merges
    ), "corpus should force space-containing merge tokens"
    out = tmp_path / "model"
    tr.save(out)

    lines = (out / "merges.txt").read_text(encoding="utf-8").splitlines()
    non_empty = [ln for ln in lines if ln.strip()]
    assert non_empty
    for ln in non_empty:
        parts = ln.strip().split(maxsplit=1)
        assert 1 <= len(parts) <= 2, f"unparseable merges line: {ln!r}"

    from yabpe_tpu.io.native import load_model

    # Loading the corrupted-but-tolerated file must not crash; pairs are
    # possibly mangled (reference-identical behavior), never dropped below
    # the parseable 2-part lines.
    _, merges, _ = load_model(out)
    assert len(merges) >= sum(
        1 for ln in non_empty if len(ln.strip().split(maxsplit=1)) == 2
    )


def test_load_model_skips_one_part_lines(tmp_path: Path):
    """Newline-corrupted merges (the documented format hazard) load as
    1-part lines and are skipped, never crashing the loader."""
    d = tmp_path / "m"
    d.mkdir()
    (d / "vocab.json").write_text('{"a": 97, "b": 98, "ab": 256}')
    (d / "merges.txt").write_text("a b\nloneline\n\nx y z\n")
    from yabpe_tpu.io.native import load_model

    _, merges, _ = load_model(d)
    # 1-part line skipped; "x y z" splits on the FIRST space only.
    assert merges == [(b"a", b"b"), (b"x", b"y z")]


def test_save_load_roundtrip(tmp_path: Path):
    from yabpe_tpu import BBPETokenizer

    cfg = BBPETrainerConfig(vocab_size=300, min_frequency=1, special_tokens=[])
    tr = BBPETrainer(cfg)
    model = tr.train([DATA / "sample.txt"])
    tr.save(tmp_path / "m")
    tok = BBPETokenizer.from_file(tmp_path / "m")
    assert tok.vocab_size == len(model.vocab)
    text = (DATA / "sample.txt").read_text(encoding="utf-8")
    assert tok.decode(tok.encode(text)) == text


# ------------------------------------------------------------- checkpointing


def test_checkpoint_resume_matches_uninterrupted(tmp_path: Path):
    """Kill-and-resume must produce the identical model."""
    from yabpe_tpu.train import checkpoint as ckpt
    from yabpe_tpu.train.state import merges_to_bytes
    import numpy as np

    src = DATA / "sample.txt"
    kw = dict(
        vocab_size=320,
        min_frequency=1,
        max_workers=1,
        special_tokens=[],
        merge_chunk_size=16,
    )
    full = BBPETrainer(BBPETrainerConfig(**kw)).train([src])

    # Simulate a crash: train normally, then truncate the checkpoint to an
    # early step and resume from it.
    ckdir = tmp_path / "ck"
    cfg = BBPETrainerConfig(**kw, checkpoint_dir=str(ckdir), checkpoint_every_chunks=1)
    tr = BBPETrainer(cfg)
    tr.train([src])
    loaded = ckpt.load_checkpoint(ckdir, cfg)
    assert loaded is not None
    merges_ids, steps = loaded
    truncated = np.full_like(merges_ids, -1)
    truncated[:20] = merges_ids[:20]
    ckpt.save_checkpoint(ckdir, truncated, 20, cfg)

    resumed = BBPETrainer(cfg).train([src])
    assert resumed.merges == full.merges
    assert resumed.vocab == full.vocab


def test_checkpoint_resume_bigvocab_path(tmp_path: Path):
    """Kill-and-resume through the large-vocabulary (bigvocab) engine
    (vocab_cap > 2048) must also produce the identical model."""
    from yabpe_tpu.train import checkpoint as ckpt
    import numpy as np

    src = DATA / "sample.txt"
    kw = dict(
        vocab_size=2300,
        min_frequency=1,
        max_workers=1,
        special_tokens=[],
        merge_chunk_size=16,
        use_native_loop=False,
        use_fused_kernel=False,
    )
    full = BBPETrainer(BBPETrainerConfig(**kw)).train([src])

    ckdir = tmp_path / "ck"
    cfg = BBPETrainerConfig(
        **kw, checkpoint_dir=str(ckdir), checkpoint_every_chunks=1
    )
    tr = BBPETrainer(cfg)
    tr.train([src])
    loaded = ckpt.load_checkpoint(ckdir, cfg)
    assert loaded is not None
    merges_ids, steps = loaded
    truncated = np.full_like(merges_ids, -1)
    truncated[:25] = merges_ids[:25]
    ckpt.save_checkpoint(ckdir, truncated, 25, cfg)

    resumed = BBPETrainer(cfg).train([src])
    assert resumed.merges == full.merges
    assert resumed.vocab == full.vocab


def test_checkpoint_fingerprint_mismatch_ignored(tmp_path: Path):
    from yabpe_tpu.train import checkpoint as ckpt

    cfg_a = BBPETrainerConfig(vocab_size=300, special_tokens=[])
    cfg_b = BBPETrainerConfig(vocab_size=301, special_tokens=[])
    import numpy as np

    ckpt.save_checkpoint(tmp_path, np.full((4, 3), -1, np.int32), 0, cfg_a)
    assert ckpt.load_checkpoint(tmp_path, cfg_a) is not None
    assert ckpt.load_checkpoint(tmp_path, cfg_b) is None
