"""Tier-4: the HBM-kernel-sharded merge loop on the 8-device CPU mesh.

Composition of the Pallas replay/emission kernel with the data-sharded
speculative protocol (dist/hbm_sharded.py): merges must be bitwise
identical to the single-device XLA loop — the same invariance the
reference guarantees for worker counts (tests/test_trainer.py:148-165
there), lifted to chips + speculation + the packed kernel layout.
"""

from __future__ import annotations

import numpy as np
import pytest

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.dist.hbm_sharded import (
    HbmShardedUnsupported,
    run_hbm_sharded_merge_loop,
)
from yabpe_tpu.pretok.ingest import count_pretokens
from yabpe_tpu.utils.jaxsetup import compute_devices

from .common import REF_FIXTURES
from .test_dist import _single_device_merges

pytestmark = pytest.mark.skipif(
    len(compute_devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def corpus_table():
    counter = count_pretokens(
        [REF_FIXTURES / "corpus.en"], ["<|endoftext|>"], max_workers=2
    )
    base = Vocab.base(["<|endoftext|>"])
    return WordTable.from_counter(counter), base


@pytest.mark.parametrize(
    "shards,k",
    [(2, 4), pytest.param(8, 16, marks=pytest.mark.slow)],
)
def test_hbm_sharded_matches_single_device(corpus_table, shards, k):
    wt, base = corpus_table
    cap = 400
    num = cap - len(base)
    single = _single_device_merges(wt, base, cap, num)
    stats: dict = {}
    got = run_hbm_sharded_merge_loop(
        wt, base,
        vocab_cap=cap, num_merges=num, min_frequency=1,
        data_shards=shards, spec_batch=k, interpret=True,
        stats_out=stats,
    )
    np.testing.assert_array_equal(got, single)
    assert stats["merges_done"] == num
    # speculation must beat one-merge-per-collective lockstep
    assert stats["epochs"] < num


@pytest.mark.slow
def test_hbm_sharded_overflow_fallback(corpus_table):
    """A cell-log capacity too small for the heavy early merges exercises
    the per-step overflow flags and the single-merge k-fold fallback —
    results must stay bit-identical."""
    wt, base = corpus_table
    cap = 300
    num = cap - len(base)
    single = _single_device_merges(wt, base, cap, num)
    stats: dict = {}
    got = run_hbm_sharded_merge_loop(
        wt, base,
        vocab_cap=cap, num_merges=num, min_frequency=1,
        data_shards=4, spec_batch=8, cps=8, interpret=True,
        stats_out=stats,
    )
    np.testing.assert_array_equal(got, single)
    assert stats["merges_done"] == num


@pytest.mark.slow
def test_hbm_sharded_min_frequency_stop(corpus_table):
    """Early stop (min_frequency) must match the single-device loop's
    stop point and leave the tail of the record at -1."""
    wt, base = corpus_table
    cap = 2000  # corpus.en runs out of >=50-count pairs well before this
    num = cap - len(base)
    import jax.numpy as jnp
    from yabpe_tpu.train.state import init_state, merge_chunk

    st = init_state(wt, base, cap, num)
    start = 0
    while start < num:
        st = merge_chunk(
            st, jnp.asarray(start, jnp.int32),
            vocab_cap=cap, min_frequency=50,
            num_merges=num, chunk_size=64,
        )
        start += 64
        if bool(st.stopped):
            break
    single = np.asarray(st.merges)
    got = run_hbm_sharded_merge_loop(
        wt, base,
        vocab_cap=cap, num_merges=num, min_frequency=50,
        data_shards=4, spec_batch=8, interpret=True,
    )
    np.testing.assert_array_equal(got, single)
    assert (got[-1] == -1).all()  # stopped early: tail unwritten


def test_hbm_sharded_rejects_oversize_vocab(corpus_table):
    wt, base = corpus_table
    with pytest.raises(HbmShardedUnsupported, match="vocab_cap"):
        run_hbm_sharded_merge_loop(
            wt, base,
            vocab_cap=70000, num_merges=100, min_frequency=1,
            data_shards=2, interpret=True,
        )


@pytest.mark.slow
def test_hbm_sharded_wide_u16_ids():
    """Symbol ids past the i16 range (u16 bit patterns in the packed
    shards) through the FULL sharded loop: a synthetic base vocabulary
    of 33,000+ tokens puts every live id above 32,768, so the kernel's
    wide mode, the 2D selection and the 2D validation scatter are all
    exercised with genuinely wide values (VERDICT r4 #6)."""
    tokens = [bytes([i]) for i in range(256)]
    tokens += [
        bytes([i, j]) for i in range(256) for j in range(128)
    ]  # 33,024 base tokens
    base = Vocab()
    for t in tokens:
        base.add(t)
    b0 = len(base)
    assert b0 > 32768
    rng = np.random.default_rng(7)
    pool = np.arange(b0 - 64, b0, dtype=np.int32)  # ids ~33k (all wide)
    n = 240
    width = 6
    words = np.full((n, width), -1, np.int32)
    for i in range(n):
        ln = int(rng.integers(2, width + 1))
        words[i, :ln] = rng.choice(pool, size=ln)
    wt = WordTable(
        words=words,
        freqs=rng.integers(1, 50, size=n).astype(np.int64),
        num_words=n,
        max_len=width,
    )
    num = 12
    cap = b0 + num
    single = _single_device_merges(wt, base, cap, num)
    got = run_hbm_sharded_merge_loop(
        wt, base,
        vocab_cap=cap, num_merges=num, min_frequency=1,
        data_shards=2, spec_batch=4, interpret=True,
    )
    np.testing.assert_array_equal(got, single)
    live = got[got[:, 0] >= 0]
    assert (live[:, :2] > 32768).all()  # the ids really were wide


@pytest.mark.slow
def test_hbm_sharded_gpt2_scale_vocab_cap(corpus_table):
    """V=50,257 — the reference's own conformance scale — through the
    kernel-sharded route in interpret mode: the [V, V] replicated state
    and 2D scatters must stay exact and shard-invariant. The merge
    record is cap-independent while cap >= base + num, so a small-cap
    single-device run is the oracle."""
    wt, base = corpus_table
    num = 6
    oracle = _single_device_merges(wt, base, 512, num)[:num]
    got = run_hbm_sharded_merge_loop(
        wt, base,
        vocab_cap=50257, num_merges=num, min_frequency=1,
        data_shards=2, spec_batch=3, interpret=True,
    )
    np.testing.assert_array_equal(got[:num], oracle)


@pytest.mark.slow
def test_hbm_sharded_checkpoint_resume(corpus_table, tmp_path):
    """Kill-and-resume through the kernel-sharded loop: a checkpoint
    truncated to 30 merges must replay through the same kernel dispatch
    + validate fold and continue to the identical record (VERDICT r4 #7;
    mirrors test_hbm_loop.py::test_hbm_checkpoint_resume_trainer)."""
    wt, base = corpus_table
    cap = 400
    num = cap - len(base)
    full = run_hbm_sharded_merge_loop(
        wt, base,
        vocab_cap=cap, num_merges=num, min_frequency=1,
        data_shards=4, spec_batch=8, interpret=True,
    )
    truncated = np.full_like(full, -1)
    truncated[:30] = full[:30]
    saved = []
    resumed = run_hbm_sharded_merge_loop(
        wt, base,
        vocab_cap=cap, num_merges=num, min_frequency=1,
        data_shards=4, spec_batch=8, interpret=True,
        resume=(truncated, 30),
        on_chunk=lambda m, s: saved.append(s),
    )
    np.testing.assert_array_equal(resumed, full)
    assert saved and saved[-1] == num  # saver fired on live epochs only
    assert min(saved) > 30


def test_hbm_sharded_checkpoint_resume_trainer(tmp_path):
    """End-to-end: checkpoint_dir + use_hbm_kernel + data_shards resumes
    byte-identically through the trainer routing."""
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
        data_shards=4,
        use_hbm_kernel=True,
        use_native_loop=False,
        spec_merges_per_round=8,
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
    truncated[:15] = merges_ids[:15]
    ckpt.save_checkpoint(ckdir, truncated, 15, cfg)

    resumed = BBPETrainer(cfg).train([f])
    assert resumed.merges == full.merges
    assert resumed.vocab == full.vocab


def test_trainer_routes_hbm_sharded(tmp_path):
    """use_hbm_kernel=True + data_shards routes end-to-end through the
    kernel-sharded loop, byte-identical to the plain single-device run."""
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    f = tmp_path / "c.txt"
    f.write_text(
        (REF_FIXTURES / "corpus.en").read_text(encoding="utf-8")[:40_000],
        encoding="utf-8",
    )
    kw = dict(
        vocab_size=360,
        min_frequency=1,
        max_workers=2,
        special_tokens=["<|endoftext|>"],
        use_native_loop=False,
    )
    single = BBPETrainer(BBPETrainerConfig(**kw)).train([f])
    sharded = BBPETrainer(
        BBPETrainerConfig(**kw, data_shards=4, use_hbm_kernel=True)
    ).train([f])
    assert sharded.merges == single.merges
    assert sharded.vocab == single.vocab
