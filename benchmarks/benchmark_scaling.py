"""Scaling analysis for the sharded merge loop (virtual CPU mesh).

No multi-chip hardware is reachable from this sandbox, so this harness
demonstrates the two properties that determine real-pod scaling instead of
raw wall clock:

1. **Exactness**: the sharded loop's merge record is bit-identical for
   every shard count (the reference could only assert worker-count
   invariance of ingestion, tests/test_trainer.py:148-165; here the whole
   training run is shard-invariant).
2. **Per-chip work**: XLA compiles one per-device SPMD module; its cost
   analysis (flops / bytes accessed) should scale ~1/N with data shards,
   while the collective payload per step is only the tier-sized sparse
   merge delta all-gathered over the data axis (the count table itself
   never moves) — the ingredients of the >= 80% bytes/s scaling target in
   BASELINE.json.

Run on the 8-device virtual mesh:
    JAX_PLATFORMS=cpu YABPE_BACKEND=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/benchmark_scaling.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))


def main() -> int:
    import numpy as np

    from yabpe_tpu.core.vocab import Vocab
    from yabpe_tpu.core.wordtable import WordTable
    from yabpe_tpu.dist.sharded import run_sharded_merge_loop
    from yabpe_tpu.pretok.ingest import count_pretokens
    from yabpe_tpu.utils.jaxsetup import compute_devices

    n_dev = len(compute_devices())
    if n_dev < 8:
        print(
            f"only {n_dev} devices visible; run with JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8"
        )
        return 1

    corpus = Path("/root/reference/tests/fixtures_gpt2/corpus.en")
    counter = count_pretokens([corpus], ["<|endoftext|>"], max_workers=4)
    table = WordTable.from_counter(counter)
    base = Vocab.base(["<|endoftext|>"])
    vocab_cap, num_merges = 500, 500 - 257

    results: dict[int, np.ndarray] = {}
    for shards in (1, 2, 4, 8):
        t0 = time.perf_counter()
        merges = run_sharded_merge_loop(
            table,
            base,
            vocab_cap=vocab_cap,
            num_merges=num_merges,
            min_frequency=1,
            data_shards=shards,
        )
        dt = time.perf_counter() - t0
        results[shards] = merges
        print(f"data_shards={shards}: {dt:.2f}s (incl. compile)")

    for shards in (2, 4, 8):
        same = np.array_equal(results[1], results[shards])
        print(f"merges[{shards} shards] == merges[1 shard]: {same}")
        assert same, "shard-count variance!"

    # Per-device SPMD cost of one jitted merge chunk vs shard count.
    _per_device_cost(table, base, vocab_cap, num_merges)

    _wall_clock()
    return 0


def _wall_clock() -> None:
    """Warm wall-clock of the FULL sharded merge loop vs shard count.

    The virtual CPU mesh executes all per-device programs on one host, so
    ideal data sharding keeps total wall-clock FLAT as shards grow (8
    devices each doing 1/8 of the work); replicated per-device state
    maintenance inflates it toward 8x its share. Step-time scaling
    efficiency at s shards is therefore t(1)/t(s) — the quantity the
    VERDICT's >= 60% target refers to. Realistic 5 MB corpus @ vocab 1024
    so the sharded portion dominates honestly (50k unique words).
    """
    import numpy as np

    from yabpe_tpu.core.vocab import Vocab
    from yabpe_tpu.core.wordtable import WordTable
    from yabpe_tpu.dist.sharded import run_sharded_merge_loop
    from yabpe_tpu.pretok.ingest import count_pretokens

    real5m = REPO / "tests" / "fixtures_gpt2" / "bench_5M_realistic.txt"
    if not real5m.exists():
        sys.path.insert(0, str(REPO / "scripts"))
        import gen_corpus

        gen_corpus.generate(str(real5m), 5.0)
    counter = count_pretokens([real5m], ["<|endoftext|>"], max_workers=4)
    table = WordTable.from_counter(counter)
    base = Vocab.base(["<|endoftext|>"])
    vocab_cap = 1024
    num_merges = 1024 - 257

    print(
        "\nwall-clock of the full merge loop vs data shards "
        "(warm best-of-2; flat == ideal on a serializing virtual mesh):"
    )
    times: dict[int, float] = {}
    merges0 = None
    for shards in (1, 2, 4, 8):
        run = lambda: run_sharded_merge_loop(  # noqa: E731
            table,
            base,
            vocab_cap=vocab_cap,
            num_merges=num_merges,
            min_frequency=1,
            data_shards=shards,
            chunk_size=128,
        )
        merges = run()  # compile
        if merges0 is None:
            merges0 = merges
        assert np.array_equal(merges, merges0), "shard-count variance!"
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        times[shards] = best
        eff = times[1] / best
        print(
            f"  data_shards={shards}: {best:.2f}s warm "
            f"(step-time scaling {eff * 100:.0f}%)"
        )


def _per_device_cost(table, base, vocab_cap, num_merges) -> None:
    from functools import partial

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yabpe_tpu.dist.mesh import make_data_mesh
    from yabpe_tpu.dist.sharded import (
        _round_up,
        _sharded_chunk_incremental,
        state_partition_specs,
    )
    from yabpe_tpu.train.bigvocab import BigState
    from yabpe_tpu.train.incremental import init_counts, pick_affected_cap
    from yabpe_tpu.train.state import init_state

    import jax.numpy as jnp

    print("\nper-device SPMD cost of one 64-merge chunk (XLA cost analysis):")
    base_flops = base_bytes = None
    for shards in (1, 2, 4, 8):
        mesh = make_data_mesh(shards)
        padded = table.pad_rows_to(_round_up(table.words.shape[0], shards))
        core = init_state(padded, base, vocab_cap, num_merges)
        rows_per_shard = padded.words.shape[0] // shards
        counts0 = init_counts(core.words, core.freqs, vocab_cap=vocab_cap)
        state = BigState(
            core=core,
            counts=counts0,
            row_max=jnp.max(
                counts0.reshape(vocab_cap, vocab_cap), axis=1
            ),
        )
        specs = BigState(
            core=state_partition_specs(), counts=P(), row_max=P()
        )
        state = jax.device_put(
            state,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                specs,
                is_leaf=lambda x: isinstance(x, P),
            ),
        )
        body = partial(
            _sharded_chunk_incremental,
            vocab_cap=vocab_cap,
            min_frequency=1,
            num_merges=num_merges,
            chunk_size=64,
            affected_cap=pick_affected_cap(rows_per_shard),
        )
        from jax import shard_map

        fn = jax.jit(
            shard_map(
                body,
                mesh=mesh,
                in_specs=(specs, P()),
                out_specs=specs,
                check_vma=False,
            )
        )
        compiled = fn.lower(state, jnp.asarray(0, jnp.int32)).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        nbytes = float(cost.get("bytes accessed", float("nan")))
        if base_flops is None:
            base_flops, base_bytes = flops, nbytes
        print(
            f"  data_shards={shards}: flops/device={flops:.3e} "
            f"({base_flops / flops:.2f}x less), "
            f"bytes/device={nbytes:.3e} ({base_bytes / nbytes:.2f}x less)"
        )


if __name__ == "__main__":
    raise SystemExit(main())
