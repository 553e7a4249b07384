"""Benchmark harness. Prints ONE JSON line to stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: end-to-end training throughput (bytes/s) on a 5 MB *realistic*
corpus @ vocab 1000 — a deterministic Zipf-lexicon corpus
(scripts/gen_corpus.py, seed 7, ~50k unique pre-tokens) rather than the
reference benchmark's repeated TinyStories sample (only 275 unique
pre-tokens once repeated to 5 MB, which flatters every implementation).
The baseline is the reference implementation measured on THIS sandbox on
the SAME corpus: 7.76 s end-to-end = 675,213 bytes/s (best of 2, parity
config, 743 merges — byte-identical merges to ours, verified). Secondary
metrics (the reference's own repeated-sample workload, corpus.en latency,
device encode throughput) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO / "src"))

# Reference numbers measured on this sandbox (see BASELINE.md and module doc).
BASELINE_TRAIN_REAL5M_BYTES_PER_S = 675_213.0
BASELINE_TRAIN_5M_BYTES_PER_S = 1_480_608.0
BASELINE_ENCODE_5M_MB_PER_S = 9.79  # repeated corpus, warm LRU
BASELINE_ENCODE_REAL5M_MB_PER_S = 2.32  # realistic corpus, warm LRU
BASELINE_TRAIN_CORPUS_EN_S = 0.24

FIVE_M = REPO / "tests" / "fixtures_gpt2" / "tinystories_sample_5M.txt"
REAL_5M = REPO / "tests" / "fixtures_gpt2" / "bench_5M_realistic.txt"
CORPUS_EN = Path("/root/reference/tests/fixtures_gpt2/corpus.en")


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _ensure_5m() -> None:
    if FIVE_M.exists() and FIVE_M.stat().st_size > 4_900_000:
        return
    sample = Path(
        "/root/reference/tests/fixtures_gpt2/tinystories_sample.txt"
    ).read_text(encoding="utf-8")
    reps = (5 * 1024 * 1024) // len(sample.encode("utf-8")) + 1
    FIVE_M.parent.mkdir(parents=True, exist_ok=True)
    with open(FIVE_M, "w", encoding="utf-8") as f:
        for _ in range(reps):
            f.write(sample)


def _ensure_real5m() -> None:
    if REAL_5M.exists() and REAL_5M.stat().st_size > 4_900_000:
        return
    sys.path.insert(0, str(REPO / "scripts"))
    import gen_corpus

    gen_corpus.generate(str(REAL_5M), 5.0)


def _train_bps(path: Path, label: str, baseline: float) -> float:
    """End-to-end bytes/s @ vocab-1000 on ``path`` (warm, best of 2)."""
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    cfg = BBPETrainerConfig(
        vocab_size=1000,
        min_frequency=1,
        max_workers=8,
        chunk_size_bytes=1 << 20,
        special_tokens=["<|endoftext|>"],
        align_chunks_to_newline=True,
    )
    size = path.stat().st_size
    tr = BBPETrainer(cfg)
    tr.train([path])  # warm-up: jit compile (persistent-cached)
    best = 0.0
    # Best-of-4: this sandbox sees hypervisor CPU-steal bursts that can
    # halve a single rep; the best rep reflects the implementation.
    for _ in range(4):
        t0 = time.perf_counter()
        tr.train([path])
        dt = time.perf_counter() - t0
        best = max(best, size / dt)
        _log(
            f"{label}: {dt:.3f}s total "
            f"(ingest {tr.last_stats['ingest_seconds']:.3f}s, "
            f"merge {tr.last_stats['merge_seconds']:.3f}s) "
            f"= {size / dt / 1e6:.2f} MB/s ({size / dt / baseline:.1f}x ref)"
        )
    return best


def bench_train_corpus_en() -> float:
    """Parity workload: corpus.en @ vocab 500 (seconds, warm)."""
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    cfg = BBPETrainerConfig(
        vocab_size=500,
        min_frequency=1,
        max_workers=1,
        chunk_size_bytes=1 << 30,
        special_tokens=["<|endoftext|>"],
    )
    tr = BBPETrainer(cfg)
    tr.train([CORPUS_EN])
    t0 = time.perf_counter()
    tr.train([CORPUS_EN])
    dt = time.perf_counter() - t0
    _log(f"train_corpus_en: {dt:.3f}s (reference {BASELINE_TRAIN_CORPUS_EN_S}s)")
    return dt


def bench_train_100m_bigvocab() -> None:
    """North-star-scale stderr detail: 100 MB @ vocab 32000 (the
    BASELINE.json workload shape at 1/10 size; the full 1 GB measurement
    is recorded in PERFORMANCE.md). Corpus cached in /tmp across runs."""
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig
    from yabpe_tpu.utils import hostmem

    corpus = Path("/tmp/yabpe_bench_100M.txt")
    if not corpus.exists() or corpus.stat().st_size < 99_000_000:
        sys.path.insert(0, str(REPO / "scripts"))
        import gen_corpus

        gen_corpus.generate(str(corpus), 100.0, lexicon_size=200_000)
    hostmem.warm_heap(1024)
    size = corpus.stat().st_size
    cfg = BBPETrainerConfig(
        vocab_size=32000,
        min_frequency=2,
        max_workers=8,
        chunk_size_bytes=32 << 20,
        special_tokens=["<|endoftext|>"],
        align_chunks_to_newline=True,
    )
    tr = BBPETrainer(cfg)
    tr.train([corpus])  # warm: page cache + arena
    t0 = time.perf_counter()
    model = tr.train([corpus])
    dt = time.perf_counter() - t0
    _log(
        f"train_100m_vocab32k: {dt:.1f}s = {size / dt / 1e6:.1f} MB/s "
        f"({len(model.merges)} merges; ingest "
        f"{tr.last_stats['ingest_seconds']:.1f}s, merge "
        f"{tr.last_stats['merge_seconds']:.1f}s)"
    )


def bench_train_100m_hbm() -> None:
    """Forced DEVICE path at flagship scale: 100 MB @ vocab 32000 through
    the HBM-tiled fused Pallas kernel (the chip carries the whole merge
    loop; merges must be byte-identical to the native engine)."""
    import jax

    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    if jax.default_backend() == "cpu":
        _log("train_100m_vocab32k_hbm: skipped (CPU backend)")
        return
    corpus = Path("/tmp/yabpe_bench_100M.txt")
    size = corpus.stat().st_size
    cfg = BBPETrainerConfig(
        vocab_size=32000,
        min_frequency=2,
        max_workers=8,
        chunk_size_bytes=32 << 20,
        special_tokens=["<|endoftext|>"],
        align_chunks_to_newline=True,
        use_native_loop=False,
        use_hbm_kernel=True,
    )
    tr = BBPETrainer(cfg)
    tr.train([corpus])  # warm-up (compile cached persistently)
    t0 = time.perf_counter()
    model = tr.train([corpus])
    dt = time.perf_counter() - t0
    _log(
        f"train_100m_vocab32k_hbm(pallas, TPU): {dt:.1f}s = "
        f"{size / dt / 1e6:.1f} MB/s ({len(model.merges)} merges; ingest "
        f"{tr.last_stats['ingest_seconds']:.1f}s, merge "
        f"{tr.last_stats['merge_seconds']:.1f}s)"
    )


def bench_train_1g() -> None:
    """The BASELINE.json north-star workload, driver-visible: 1 GB @ vocab
    32000 end-to-end (auto engine routing). Corpus cached in /tmp."""
    from yabpe_tpu import BBPETrainer, BBPETrainerConfig
    from yabpe_tpu.utils import hostmem

    corpus = Path("/tmp/yabpe_bench_1G.txt")
    if not corpus.exists() or corpus.stat().st_size < 1_000_000_000:
        sys.path.insert(0, str(REPO / "scripts"))
        import gen_corpus

        _log("generating 1 GB corpus (cached across runs)...")
        gen_corpus.generate(str(corpus), 1024.0, lexicon_size=400_000)
    hostmem.warm_heap(2048)
    size = corpus.stat().st_size
    cfg = BBPETrainerConfig(
        vocab_size=32000,
        min_frequency=2,
        max_workers=8,
        chunk_size_bytes=64 << 20,
        special_tokens=["<|endoftext|>"],
        align_chunks_to_newline=True,
    )
    tr = BBPETrainer(cfg)
    best = 0.0
    detail = ""
    for _ in range(2):  # rep 1 warms the page cache; best-of reported
        t0 = time.perf_counter()
        model = tr.train([corpus])
        dt = time.perf_counter() - t0
        if size / dt > best:
            best = size / dt
            detail = (
                f"{dt:.1f}s = {size / dt / 1e6:.1f} MB/s "
                f"({len(model.merges)} merges; ingest "
                f"{tr.last_stats['ingest_seconds']:.1f}s, merge "
                f"{tr.last_stats['merge_seconds']:.1f}s)"
            )
    _log(f"train_1g_vocab32k: {detail}")


def bench_train_1g_hbm() -> None:
    """Forced DEVICE path at the full 1 GB north star: the HBM kernel in
    words-in-HBM streaming mode carries all 31,743 merges on-chip, and
    the merge list must be byte-identical to the native engine's."""
    import jax

    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    if jax.default_backend() == "cpu":
        _log("train_1g_vocab32k_hbm: skipped (CPU backend)")
        return
    corpus = Path("/tmp/yabpe_bench_1G.txt")
    size = corpus.stat().st_size
    kw = dict(
        vocab_size=32000,
        min_frequency=2,
        max_workers=8,
        chunk_size_bytes=64 << 20,
        special_tokens=["<|endoftext|>"],
        align_chunks_to_newline=True,
    )
    ref = BBPETrainer(BBPETrainerConfig(**kw))
    want = ref.train([corpus]).merges  # native engine (fast, page-warm)
    tr = BBPETrainer(
        BBPETrainerConfig(**kw, use_native_loop=False, use_hbm_kernel=True)
    )
    # Warm-up rep: the persistent compile cache for big TPU programs has
    # proven flaky (same-session recompiles observed), and a cold
    # streaming-mode compile costs minutes — without this the recorded
    # number can be mostly compile time.
    t0 = time.perf_counter()
    model = tr.train([corpus])
    warm_dt = time.perf_counter() - t0
    assert model.merges == want, "1 GB HBM-kernel merges diverge from native"
    _log(f"train_1g_vocab32k_hbm warm-up rep: {warm_dt:.1f}s (incl. any compile)")
    t0 = time.perf_counter()
    model = tr.train([corpus])
    dt = time.perf_counter() - t0
    assert model.merges == want, "1 GB HBM-kernel merges diverge from native"
    _log(
        f"train_1g_vocab32k_hbm(pallas, TPU): {dt:.1f}s = "
        f"{size / dt / 1e6:.1f} MB/s ({len(model.merges)} merges, "
        f"byte-identical to native; ingest "
        f"{tr.last_stats['ingest_seconds']:.1f}s, merge "
        f"{tr.last_stats['merge_seconds']:.1f}s)"
    )


def bench_train_corpus_en_fused() -> None:
    """TPU path live check: corpus.en @500 forced through the fused Pallas
    VMEM kernel (warm; merges must match the golden engine)."""
    import jax

    from yabpe_tpu import BBPETrainer, BBPETrainerConfig

    if jax.default_backend() == "cpu":
        _log("train_corpus_en_fused: skipped (CPU backend)")
        return
    cfg = BBPETrainerConfig(
        vocab_size=500,
        min_frequency=1,
        max_workers=1,
        chunk_size_bytes=1 << 30,
        special_tokens=["<|endoftext|>"],
        use_native_loop=False,
        use_fused_kernel=True,
    )
    tr = BBPETrainer(cfg)
    model = tr.train([CORPUS_EN])  # warm-up (compile cached)
    t0 = time.perf_counter()
    model = tr.train([CORPUS_EN])
    dt = time.perf_counter() - t0
    _log(
        f"train_corpus_en_fused(pallas, TPU): {dt:.3f}s, "
        f"{len(model.merges)} merges (reference {BASELINE_TRAIN_CORPUS_EN_S}s)"
    )


def bench_encode_5m() -> float:
    """Encode throughput with the GPT-2 model on both corpora (MB/s)."""
    from yabpe_tpu import BBPETokenizer
    from yabpe_tpu.io import gpt2 as gpt2io

    merges = gpt2io.load_gpt2_merges(
        "/root/reference/tests/fixtures_gpt2/gpt2_merges.txt"
    )
    vocab = gpt2io.load_gpt2_vocab(REPO / "tests/fixtures_gpt2/gpt2_vocab.json")
    tok = BBPETokenizer(
        vocab=vocab, merges=merges, special_tokens=["<|endoftext|>"]
    )
    text = FIVE_M.read_text(encoding="utf-8")
    nbytes = len(text.encode("utf-8"))
    # Warm-up at full size: compiles the kernels AND faults in the working
    # set once (hostmem.tune_malloc keeps the pages in the arena — this
    # sandbox provides fresh anonymous memory at only ~7 MB/s).
    tok.encode_batch([text], device=True)
    t0 = time.perf_counter()
    [ids] = tok.encode_batch([text], device=True)
    dt = time.perf_counter() - t0
    _log(
        f"encode_5m_repeated(device): {dt:.3f}s = {nbytes / dt / 1e6:.2f} MB/s, "
        f"{len(ids)} tokens (reference warm-cache {BASELINE_ENCODE_5M_MB_PER_S} MB/s)"
    )

    real = REAL_5M.read_text(encoding="utf-8")
    nreal = len(real.encode("utf-8"))
    tok.encode(real)  # warm-up: encoder tables + page faults at full size
    t0 = time.perf_counter()
    ids_r = tok.encode(real)
    dt_r = time.perf_counter() - t0
    _log(
        f"encode_real5m(host): {dt_r:.3f}s = {nreal / dt_r / 1e6:.2f} MB/s, "
        f"{len(ids_r)} tokens ({nreal / dt_r / 1e6 / BASELINE_ENCODE_REAL5M_MB_PER_S:.1f}x "
        f"reference warm-cache {BASELINE_ENCODE_REAL5M_MB_PER_S} MB/s)"
    )
    return nbytes / dt / 1e6


def _worker() -> None:
    """Run all phases in this process and print the result JSON."""
    import jax

    from yabpe_tpu.utils import hostmem

    _log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    hostmem.warm_heap(512)  # pre-fault via huge pages: ~10x cheaper than
    _log(f"heap warm: {time.perf_counter() - t0:.1f}s")  # lazy 4K faults
    _ensure_5m()
    _ensure_real5m()

    train_bps = _train_bps(
        REAL_5M, "train_real5m", BASELINE_TRAIN_REAL5M_BYTES_PER_S
    )
    try:
        _train_bps(FIVE_M, "train_5m_repeated", BASELINE_TRAIN_5M_BYTES_PER_S)
        bench_train_corpus_en()
        bench_encode_5m()
        bench_train_100m_bigvocab()
        bench_train_corpus_en_fused()
        bench_train_100m_hbm()
        bench_train_1g()
        bench_train_1g_hbm()
    except Exception as e:  # subsidiary benches must not kill the headline
        _log(f"subsidiary bench failed: {e!r}")

    _cross_round_compare(train_bps)
    print(
        json.dumps(
            {
                "metric": "train_bpe_realistic5MB_vocab1000_bytes_per_s",
                "value": round(train_bps, 1),
                "unit": "bytes/s",
                "vs_baseline": round(
                    train_bps / BASELINE_TRAIN_REAL5M_BYTES_PER_S, 3
                ),
            }
        ),
        flush=True,
    )


def _cross_round_compare(train_bps: float) -> None:
    """Flag real regressions behind this 2-core VM's run-to-run noise:
    compare the headline against every recorded BENCH_r*.json (round 2
    measured 97x, round 3 measured 72x with identical code, so only a
    drop below ~60% of the best prior round is worth investigating)."""
    prior = []
    for p in sorted(REPO.glob("BENCH_r*.json")):
        try:
            rec = json.loads(p.read_text())
            prior.append((p.name, float(rec["parsed"]["value"])))
        except Exception:
            continue
    if not prior:
        return
    best_name, best = max(prior, key=lambda kv: kv[1])
    ratio = train_bps / best
    # 0.8x threshold (was 0.6x — a real 26% round-3 drop sailed through).
    # Run-to-run noise on the shared sandbox measures ~±10%, so 0.8x
    # flags genuine regressions without tripping on jitter.
    flag = " [REGRESSION? below 0.8x best prior]" if ratio < 0.8 else ""
    _log(
        f"cross-round: headline {train_bps / 1e6:.1f} MB/s vs best prior "
        f"{best / 1e6:.1f} MB/s ({best_name}) = {ratio:.2f}x{flag}"
    )


def main() -> None:
    """Driver: run the worker in a subprocess so a wedged TPU tunnel cannot
    hang the benchmark; fall back to the CPU backend if the TPU attempt
    times out or dies (the sandbox's TPU link is occasionally congested for
    minutes at a time)."""
    import subprocess

    def attempt(env_extra: dict[str, str], timeout_s: float) -> str | None:
        env = dict(os.environ)
        env.update(env_extra)
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker"],
                env=env,
                stdout=subprocess.PIPE,
                timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            _log("bench attempt timed out")
            return None
        if proc.returncode != 0:
            _log(f"bench attempt exited {proc.returncode}")
            return None
        lines = [
            ln
            for ln in proc.stdout.decode("utf-8", "replace").splitlines()
            if ln.strip().startswith("{")
        ]
        return lines[-1] if lines else None

    # Budget covers a cold remote compile of the big HBM-kernel shapes
    # (measured 100-1000+ s on a congested tunnel — the 1 GB streaming
    # variant alone exceeded 2100 s total once) on top of the ~8 min of
    # warm measurements (incl. the 1 GB forced-device run).
    result = attempt({}, timeout_s=3000.0)
    if result is None:
        _log("falling back to CPU backend")
        cpu_env = {"JAX_PLATFORMS": "cpu", "YABPE_BACKEND": "cpu"}
        # Disable the sandbox's eager TPU plugin registration hook so
        # JAX_PLATFORMS=cpu actually takes effect in the child.
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        result = attempt(cpu_env, timeout_s=900.0)
    if result is None:
        result = json.dumps(
            {
                "metric": "train_bpe_5MB_vocab1000_bytes_per_s",
                "value": 0.0,
                "unit": "bytes/s",
                "vs_baseline": 0.0,
                "error": "all bench attempts timed out (TPU link wedged)",
            }
        )
    print(result, flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker()
    else:
        main()
