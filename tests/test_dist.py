"""Tier-4: multi-device tests on a forced 8-device CPU mesh.

The reference has no distributed runtime; these tests are the TPU-native
analogue of its worker-count-invariance guarantees (SURVEY.md §4.5): any
shard count must produce bit-identical training results.
"""

from __future__ import annotations

import os
from pathlib import Path

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


@pytest.mark.parametrize("data_shards,vocab_shards", [(2, 2), (1, 4), (4, 2)])
def test_vocab_shard_invariance(corpus_table, data_shards, vocab_shards):
    """2D (data, vocab) mesh: the vocab-sharded count table must produce
    the exact single-device merge sequence for any shard layout."""
    wt, base = corpus_table
    single = _single_device_merges(wt, base, 400, 400 - len(base))
    sharded = run_sharded_merge_loop(
        wt,
        base,
        vocab_cap=400,
        num_merges=400 - len(base),
        min_frequency=1,
        data_shards=data_shards,
        vocab_shards=vocab_shards,
        chunk_size=64,
    )
    assert np.array_equal(single, sharded)


@pytest.mark.parametrize("shards,spec", [(2, 4), (2, 16), (4, 8), (8, 8)])
def test_speculative_shard_invariance(corpus_table, shards, spec):
    """The latency-tolerant speculate/validate loop (k merges per
    collective round, dist/speculative.py) must be bit-identical to the
    single-device sequence — including rolled-back epochs and the
    overflow fallback through the tiered per-merge body."""
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
        spec_batch=spec,
    )
    assert np.array_equal(single, sharded)


def test_speculative_early_stop():
    """min_frequency stop must be honored mid-epoch (validation detects
    the true stop even when speculation ran past it)."""
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
        spec_batch=8,
    )
    assert (merges[0] == [ord("a"), ord("b"), 256]).all()
    assert (merges[1:] == -1).all()


def test_sharded_checkpoint_resume(corpus_table, tmp_path):
    """Kill-and-resume through the data-sharded loop must reproduce the
    uninterrupted sharded (and single-device) merge sequence."""
    from yabpe_tpu import BBPETrainerConfig
    from yabpe_tpu.train import checkpoint as ckpt

    cfg = BBPETrainerConfig(
        vocab_size=400, min_frequency=1, special_tokens=["<|endoftext|>"]
    )
    wt, base = corpus_table
    num = 400 - len(base)
    full = run_sharded_merge_loop(
        wt, base, vocab_cap=400, num_merges=num, min_frequency=1,
        data_shards=4, chunk_size=32,
    )

    # Simulate a crash at merge 40: persist a truncated checkpoint and
    # resume the sharded loop from it.
    truncated = np.full_like(full, -1)
    truncated[:40] = full[:40]
    ckpt.save_checkpoint(tmp_path, truncated, 40, cfg)
    loaded = ckpt.load_checkpoint(tmp_path, cfg)
    assert loaded is not None
    resumed = run_sharded_merge_loop(
        wt, base, vocab_cap=400, num_merges=num, min_frequency=1,
        data_shards=4, chunk_size=32, resume=loaded,
    )
    assert np.array_equal(resumed, full)


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


def test_multihost_ingest_degenerate_and_table_union(tmp_path):
    """Single-process count_pretokens_global == local raw ingest, and the
    cross-host raw-table union (add_table) == one-shot counting."""
    from yabpe_tpu import native
    from yabpe_tpu.dist.ingest import count_pretokens_global, shard_files
    from yabpe_tpu.pretok.ingest import count_pretokens_raw, counter_from_raw

    if not native.available():
        pytest.skip("native scanner unavailable")

    f1 = tmp_path / "a.txt"
    f2 = tmp_path / "b.txt"
    f1.write_text("the cat sat on the mat<|endoftext|>again the cat\n" * 50)
    f2.write_text("ein Hund läuft 😀 durch die Stadt\nthe cat returns\n" * 40)

    # Degenerate single-process path.
    g = count_pretokens_global([f1, f2], ["<|endoftext|>"], max_workers=2)
    local = count_pretokens_raw(
        [f1, f2], ["<|endoftext|>"],
        chunk_size_bytes=32 * 1024 * 1024, max_workers=2,
        align_to_newline=True,
    )
    assert counter_from_raw(*g) == counter_from_raw(*local)

    # Simulated 2-host union: per-shard tables folded via add_table.
    shards = [shard_files([f1, f2], p, 2) for p in range(2)]
    assert shards[0] == [f1] and shards[1] == [f2]
    root = native.NativeCounter()
    for shard in shards:
        t = count_pretokens_raw(
            shard, ["<|endoftext|>"],
            chunk_size_bytes=32 * 1024 * 1024, max_workers=1,
        )
        root.add_table(*t)
    words, lens, counts = root.export()
    root.close()
    one_shot = count_pretokens_raw(
        [f1, f2], ["<|endoftext|>"],
        chunk_size_bytes=1 << 30, max_workers=1,
    )
    assert counter_from_raw(words, lens, counts) == counter_from_raw(*one_shot)


def test_multihost_ingest_two_processes(tmp_path):
    """Real 2-process jax.distributed run: count_pretokens_global must
    produce the identical global table on every host, equal to the
    single-process result."""
    import hashlib
    import subprocess
    import sys

    from yabpe_tpu import native
    from yabpe_tpu.pretok.ingest import count_pretokens_raw, counter_from_raw

    if not native.available():
        pytest.skip("native scanner unavailable")

    files = [
        str(REF_FIXTURES / "corpus.en"),
        str(REF_FIXTURES / "tinystories_sample.txt"),
    ]
    expected = counter_from_raw(
        *count_pretokens_raw(files, ["<|endoftext|>"], max_workers=2)
    )
    want = hashlib.sha256(repr(sorted(expected.items())).encode()).hexdigest()

    # Pick a free coordinator port (a fixed one flakes whenever another
    # run or an unrelated listener holds it).
    import socket

    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        port = sock.getsockname()[1]

    script = tmp_path / "mh.py"
    script.write_text(
        "import os, sys\n"
        f"sys.path.insert(0, {str(Path(__file__).resolve().parents[1] / 'src')!r})\n"
        "pid = int(sys.argv[1])\n"
        "import jax\n"
        f"jax.distributed.initialize(coordinator_address='localhost:{port}',\n"
        "                           num_processes=2, process_id=pid)\n"
        "from yabpe_tpu.dist.ingest import count_pretokens_global\n"
        "from yabpe_tpu.pretok.ingest import counter_from_raw\n"
        f"files = {files!r}\n"
        "c = counter_from_raw(*count_pretokens_global(\n"
        "    files, ['<|endoftext|>'], max_workers=2))\n"
        "import hashlib\n"
        "print('DIGEST', pid,\n"
        "      hashlib.sha256(repr(sorted(c.items())).encode()).hexdigest(),\n"
        "      flush=True)\n"
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["YABPE_BACKEND"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
        )
        for p in range(2)
    ]
    digests = {}
    for p, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=240)
        assert proc.returncode == 0, out.decode()
        for line in out.decode().splitlines():
            if line.startswith("DIGEST"):
                _, pid_s, digest = line.split()
                digests[int(pid_s)] = digest
    assert digests == {0: want, 1: want}


def test_multihost_merge_loop_two_processes(tmp_path):
    """Real 2-process jax.distributed MERGE LOOP: run_sharded_merge_loop on
    a global 4-device mesh spanning both processes must produce merges
    bit-identical to the single-process loop (north star §5.8 — the
    cross-host training step, not just ingest)."""
    import hashlib
    import subprocess
    import sys

    from yabpe_tpu.pretok.ingest import count_pretokens

    corpus = REF_FIXTURES / "corpus.en"
    counter = count_pretokens([corpus], ["<|endoftext|>"], max_workers=1)
    base = Vocab.base(["<|endoftext|>"])
    wt = WordTable.from_counter(counter)
    expected = _single_device_merges(wt, base, 400, 400 - len(base))
    want = hashlib.sha256(np.ascontiguousarray(expected).tobytes()).hexdigest()

    import socket

    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        port = sock.getsockname()[1]

    script = tmp_path / "mh_merge.py"
    script.write_text(
        "import os, sys\n"
        f"sys.path.insert(0, {str(Path(__file__).resolve().parents[1] / 'src')!r})\n"
        "pid = int(sys.argv[1])\n"
        "import jax\n"
        f"jax.distributed.initialize(coordinator_address='localhost:{port}',\n"
        "                           num_processes=2, process_id=pid)\n"
        "import hashlib\n"
        "import numpy as np\n"
        "from yabpe_tpu.core.vocab import Vocab\n"
        "from yabpe_tpu.core.wordtable import WordTable\n"
        "from yabpe_tpu.dist.sharded import run_sharded_merge_loop\n"
        "from yabpe_tpu.pretok.ingest import count_pretokens\n"
        f"counter = count_pretokens([{str(corpus)!r}], ['<|endoftext|>'],\n"
        "                          max_workers=1)\n"
        "base = Vocab.base(['<|endoftext|>'])\n"
        "wt = WordTable.from_counter(counter)\n"
        "merges = run_sharded_merge_loop(\n"
        "    wt, base, vocab_cap=400, num_merges=400 - len(base),\n"
        "    min_frequency=1, data_shards=4, chunk_size=64)\n"
        "digest = hashlib.sha256(\n"
        "    np.ascontiguousarray(merges).tobytes()).hexdigest()\n"
        "print('DIGEST', pid, digest, flush=True)\n"
        "# the SPECULATIVE epochs across the same real process boundary\n"
        "# (rollback + cap0-overflow fallback under genuine gRPC)\n"
        "stats = {}\n"
        "merges_s = run_sharded_merge_loop(\n"
        "    wt, base, vocab_cap=400, num_merges=400 - len(base),\n"
        "    min_frequency=1, data_shards=4, chunk_size=64,\n"
        "    spec_batch=16, stats_out=stats)\n"
        "assert np.array_equal(merges_s, merges), 'speculative diverged'\n"
        "assert stats['spec_epochs'] > 0, stats\n"
        "print('DIGESTSPEC', pid, digest, flush=True)\n"
        "# the KERNEL-sharded loop across the same real process boundary\n"
        "# (per-process packed-shard placement + cell-log exchange under\n"
        "# genuine gRPC — VERDICT r4 #5)\n"
        "from yabpe_tpu.dist.hbm_sharded import run_hbm_sharded_merge_loop\n"
        "hstats = {}\n"
        "merges_h = run_hbm_sharded_merge_loop(\n"
        "    wt, base, vocab_cap=400, num_merges=400 - len(base),\n"
        "    min_frequency=1, data_shards=4, spec_batch=8,\n"
        "    interpret=True, stats_out=hstats)\n"
        "assert np.array_equal(merges_h, merges), 'kernel-sharded diverged'\n"
        "assert hstats['merges_done'] == 400 - len(base), hstats\n"
        "print('DIGESTHBM', pid, hashlib.sha256(\n"
        "    np.ascontiguousarray(merges_h).tobytes()).hexdigest(),\n"
        "    flush=True)\n"
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["YABPE_BACKEND"] = "cpu"
    # Two virtual CPU devices per process -> a 4-device global mesh whose
    # per-step all_gather genuinely crosses the process boundary.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for p in range(2)
    ]
    digests = {}
    spec_digests = {}
    hbm_digests = {}
    outs = {}
    for p, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=600)
        outs[p] = out.decode()
        assert proc.returncode == 0, outs[p]
        for line in outs[p].splitlines():
            if line.startswith("DIGESTSPEC"):
                _, pid_s, digest = line.split()
                spec_digests[int(pid_s)] = digest
            elif line.startswith("DIGESTHBM"):
                _, pid_s, digest = line.split()
                hbm_digests[int(pid_s)] = digest
            elif line.startswith("DIGEST"):
                _, pid_s, digest = line.split()
                digests[int(pid_s)] = digest
    assert digests == {0: want, 1: want}, outs
    assert spec_digests == {0: want, 1: want}, outs
    assert hbm_digests == {0: want, 1: want}, outs
