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


@pytest.mark.parametrize("shards,k", [(2, 4), (8, 16)])
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
            vocab_cap=40000, num_merges=100, min_frequency=1,
            data_shards=2, interpret=True,
        )


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
