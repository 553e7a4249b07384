"""Streaming batched encoding at pod scale: host-count sweep (BASELINE.json
config 5).

Encoding has no cross-host state — documents shard freely across hosts
(the pod-scale analogue of the reference's thread-pool ingest,
/root/reference/src/yet_another_bpe/trainer.py:201-213) — so the sweep
runs N separate OS processes, each streaming its size-balanced file
shard through ``BBPETokenizer.encode_file`` (pretoken-safe chunked,
exact) with the full 50,257-token GPT-2 vocabulary, and reports
aggregate bytes/s per host count plus the scaling efficiency

    efficiency(N) = t_1 / (N * max_i t_shard_i)

As in benchmark_multihost.py, per-shard time is measured in ISOLATION
(one process at a time): N concurrent DRAM-latency-bound encodes on one
sandbox box contend for the same memory system, which real separate
hosts do not. The contended concurrent wall time is printed too.
Exactness is asserted per file: token count and id checksum must match
the in-process single-run encode.

Usage:
    python benchmarks/benchmark_encode_sweep.py [n_files] [mb_per_file]
(defaults: 4 files x 8 MB, generated deterministically under /tmp)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))
sys.path.insert(0, str(REPO / "scripts"))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {src!r})
files = json.loads(sys.argv[1])
from yabpe_tpu.utils.hostmem import tune_malloc
tune_malloc()  # benchmark process: opt in (library APIs do not)
from yabpe_tpu.io import gpt2 as gpt2io
from yabpe_tpu.tok.tokenizer import BBPETokenizer
tok = BBPETokenizer(
    vocab=gpt2io.load_gpt2_vocab({vocab!r}),
    merges=gpt2io.load_gpt2_merges({merges!r}),
    special_tokens=["<|endoftext|>"],
)
out = {{}}
t0 = time.perf_counter()
for f in files:
    ids = tok.encode_file(f, max_workers=1)
    out[f] = [int(len(ids)), int(ids.sum())]
dt = time.perf_counter() - t0
print("RESULT", json.dumps({{"t": dt, "files": out}}), flush=True)
"""


def _corpus(n_files: int, mb_per_file: float) -> list[str]:
    from gen_corpus import generate

    n_bytes = int(mb_per_file * 1e6)
    files = []
    for i in range(n_files):
        p = Path(f"/tmp/yabpe_enc_sweep_{i}_{int(mb_per_file)}mb.txt")
        # The generator writes whole lines until >= n_bytes (it overshoots).
        if not p.exists() or p.stat().st_size < n_bytes:
            generate(str(p), mb_per_file, seed=100 + i)
        files.append(str(p))
    return files


def _run_processes(
    shards: list[list[str]], vocab: str, merges: str
) -> tuple[float, float, dict]:
    """Returns (max worker encode time, wall time incl. startup, results).

    The worker timer excludes interpreter/tokenizer startup (long-lived
    services on a real pod don't re-pay it per corpus); the wall is the
    full contended elapsed time.
    """
    script = _WORKER.format(src=str(REPO / "src"), vocab=vocab, merges=merges)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["YABPE_BACKEND"] = "cpu"
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, json.dumps(shard)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
        )
        for shard in shards
    ]
    per_file: dict = {}
    worker_times = []
    for proc in procs:
        out, err = proc.communicate(timeout=1200)
        if proc.returncode != 0:
            raise RuntimeError(
                "worker failed: " + out.decode()[-200:] + err.decode()[-500:]
            )
        for line in out.decode().splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[len("RESULT "):])
                worker_times.append(rec["t"])
                per_file.update(rec["files"])
    wall = time.perf_counter() - t0
    return max(worker_times), wall, per_file


def _balanced_shards(files: list[str], n: int) -> list[list[str]]:
    """Greedy size-balanced assignment (largest file to lightest shard)."""
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0] * n
    for f in sorted(files, key=os.path.getsize, reverse=True):
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += os.path.getsize(f)
    return shards


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mb = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    files = _corpus(n_files, mb)
    total_bytes = sum(os.path.getsize(f) for f in files)
    vocab = str(REPO / "tests" / "fixtures_gpt2" / "gpt2_vocab.json")
    merges = "/root/reference/tests/fixtures_gpt2/gpt2_merges.txt"

    # In-process oracle for exactness (and a warm-up of page cache).
    from yabpe_tpu.io import gpt2 as gpt2io
    from yabpe_tpu.tok.tokenizer import BBPETokenizer

    tok = BBPETokenizer(
        vocab=gpt2io.load_gpt2_vocab(vocab),
        merges=gpt2io.load_gpt2_merges(merges),
        special_tokens=["<|endoftext|>"],
    )
    oracle = {}
    for f in files:
        ids = tok.encode_file(f, max_workers=1)
        oracle[f] = [int(len(ids)), int(ids.sum())]

    # Isolated per-shard timing, one process at a time (real hosts do not
    # share this box's DRAM), with the configurations INTERLEAVED across
    # repetitions and the per-shard minimum taken: this sandbox's
    # hypervisor CPU steal throttles multi-second windows, so sequential
    # single-shot timings of different configs are not comparable.
    host_counts = (1, 2)
    reps = 4
    best: dict[tuple[int, int], float] = {}
    for rep in range(reps):
        # Alternate config order so monotone CPU-credit drain over the
        # benchmark's runtime biases neither configuration.
        ordered = host_counts if rep % 2 == 0 else host_counts[::-1]
        for n_hosts in ordered:
            shards = _balanced_shards(files, n_hosts)
            merged: dict = {}
            for si, shard in enumerate(shards):
                t, _, per_file = _run_processes([shard], vocab, merges)
                key = (n_hosts, si)
                best[key] = min(best.get(key, t), t)
                merged.update(per_file)
            if rep == 0:
                assert merged == oracle, "sharded encode diverged"
    t1 = best[(1, 0)]
    for n_hosts in host_counts:
        t_iso = max(
            best[(n_hosts, si)] for si in range(n_hosts)
        )
        eff = t1 / (n_hosts * t_iso)
        agg = total_bytes / t_iso / 1e6
        line = (
            f"hosts={n_hosts}: slowest shard {t_iso:.2f}s -> aggregate "
            f"{agg:.1f} MB/s, scaling efficiency {eff * 100:.0f}%"
        )
        if n_hosts > 1:
            shards = _balanced_shards(files, n_hosts)
            _, t_wall, per_file = _run_processes(shards, vocab, merges)
            assert per_file == oracle, "concurrent encode diverged"
            line += f" (concurrent-on-one-box wall {t_wall:.2f}s)"
        print(line)
    ntok = sum(v[0] for v in oracle.values())
    print(
        f"corpus {total_bytes / 1e6:.0f} MB, {ntok} tokens; "
        f"all host counts byte-exact vs single-process encode"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
