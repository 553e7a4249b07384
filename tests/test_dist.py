"""Tier-4: multi-device tests on a forced 8-device CPU mesh.

The reference has no distributed runtime; these tests are the TPU-native
analogue of its worker-count-invariance guarantees (SURVEY.md §4.5): any
shard count must produce bit-identical training results.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.dist.mesh import make_2d_mesh, make_data_mesh
from yabpe_tpu.dist.sharded import run_sharded_merge_loop
from yabpe_tpu.pretok.ingest import count_pretokens
from yabpe_tpu.train.state import init_state, merge_chunk

from .common import DATA, REF_FIXTURES

from yabpe_tpu.utils.jaxsetup import compute_devices

pytestmark = pytest.mark.skipif(
    len(compute_devices()) < 8, reason="needs 8 (virtual) devices"
)


def _single_device_merges(wt, base, cap, num, chunk=64):
    st = init_state(wt, base, cap, num)
    start = 0
    while start < num:
        st = merge_chunk(
            st,
            jnp.asarray(start, jnp.int32),
            vocab_cap=cap,
            min_frequency=1,
            num_merges=num,
            chunk_size=chunk,
        )
        start += chunk
        if bool(st.stopped):
            break
    return np.asarray(st.merges)


@pytest.fixture(scope="module")
def corpus_table():
    counter = count_pretokens(
        [REF_FIXTURES / "corpus.en"], ["<|endoftext|>"], max_workers=2
    )
    base = Vocab.base(["<|endoftext|>"])
    return WordTable.from_counter(counter), base


@pytest.mark.parametrize("shards", [2, 8])
def test_sharded_device_encode_matches_single(shards):
    from yabpe_tpu import BBPETokenizer
    from yabpe_tpu.io import gpt2 as gpt2io

    from .common import LOCAL_FIXTURES

    merges = gpt2io.load_gpt2_merges(REF_FIXTURES / "gpt2_merges.txt")
    vocab = gpt2io.load_gpt2_vocab(LOCAL_FIXTURES / "gpt2_vocab.json")
    tok = BBPETokenizer(
        vocab=vocab, merges=merges, special_tokens=["<|endoftext|>"]
    )
    texts = [
        (REF_FIXTURES / "address.txt").read_text(encoding="utf-8"),
        "pair<|endoftext|>of documents 東京 👋🏽",
    ]
    single = tok.encode_batch(texts, device=True)
    sharded = tok.encode_batch(texts, device=True, data_shards=shards)
    assert sharded == single
    assert single == tok.encode_batch(texts)  # host parity too


def test_mesh_construction():
    mesh = make_data_mesh(8)
    assert mesh.shape == {"data": 8}
    mesh2 = make_2d_mesh(4, 2)
    assert mesh2.shape == {"data": 4, "vocab": 2}


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_shard_count_invariance(corpus_table, shards):
    wt, base = corpus_table
    single = _single_device_merges(wt, base, 400, 400 - len(base))
    sharded = run_sharded_merge_loop(
        wt,
        base,
        vocab_cap=400,
        num_merges=400 - len(base),
        min_frequency=1,
        data_shards=shards,
        chunk_size=64,
    )
    assert np.array_equal(single, sharded)


def test_sharded_early_stop():
    counter = Counter({b"ab": 4, b"cd": 2})
    base = Vocab.base([])
    wt = WordTable.from_counter(counter)
    merges = run_sharded_merge_loop(
        wt,
        base,
        vocab_cap=300,
        num_merges=44,
        min_frequency=3,
        data_shards=4,
        chunk_size=16,
    )
    assert (merges[0] == [ord("a"), ord("b"), 256]).all()
    assert (merges[1:] == -1).all()


def test_trainer_config_data_shards(tmp_path):
    """End-to-end: BBPETrainerConfig(data_shards=8) == single device."""
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    src = DATA / "sample.txt"
    kw = dict(vocab_size=300, min_frequency=1, max_workers=1, special_tokens=[])
    single = BBPETrainer(BBPETrainerConfig(**kw)).train([src])
    sharded = BBPETrainer(BBPETrainerConfig(**kw, data_shards=8)).train([src])
    assert single.merges == sharded.merges
    assert single.vocab == sharded.vocab
