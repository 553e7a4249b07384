"""Trainer configuration.

Field-for-field parity with the reference dataclass
(/root/reference/src/yet_another_bpe/trainer.py:17-38) plus TPU-native knobs
(backend/count strategy/mesh shape). ``seed`` is kept for interface
compatibility; training is fully deterministic and never uses it, exactly as
in the reference.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field


@dataclass
class BBPETrainerConfig:
    """Configuration of a BBPE trainer.

    Attributes:
        vocab_size: Target vocabulary size, including special tokens.
        min_frequency: Minimum pair frequency for a merge to be considered.
        max_workers: Worker pool size for parallel corpus ingestion.
        chunk_size_bytes: Logical chunk size when splitting large corpora.
        seed: Unused; kept for interface compatibility.
        special_tokens: Tokens that must appear in the vocabulary and are
            pre-split as whole pre-tokens during ingestion.

        backend: "jax" runs the merge loop as jitted device code (default);
            "numpy" runs the host oracle loop (debugging / cross-checks).
        count_strategy: "dense" (exact scatter-add), "matmul" (MXU one-hot
            matmul; exact while counts < 2**24 — runtime-guarded: a corpus
            whose pair-count bound reaches 2**24 raises), or "auto" (matmul
            only where it is both exact and profitable: small vocabularies
            on TPU; dense otherwise). Resolution happens once per train()
            in yabpe_tpu.train.state.resolve_count_strategy.
        merge_chunk_size: merge steps executed per jitted chunk; the host
            only syncs the stop flag between chunks.
        ingest_processes: use a process pool for regex-path ingestion
            (beats the GIL); None = auto (processes for corpora over
            ~8 MB). Ignored by the native scanner path, which releases
            the GIL and parallelizes with threads.
        align_chunks_to_newline: end ingestion chunks at newlines so
            pre-tokens never straddle chunk boundaries (off for strict
            reference parity).
        data_shards: if > 1, shard the word table across this many devices
            (data-parallel) and psum pair counts; None/1 = single device.
        vocab_shards: if > 1 (requires data_shards), additionally shard the
            dense pair-count table by left-symbol rows over a second mesh
            axis ([V/nv, V] per device).
        max_pair_table_bytes: guard rail for the dense [V, V] count table
            (per device, after vocab sharding).
        checkpoint_dir: when set, the merge record is checkpointed there
            every ``checkpoint_every_chunks`` chunks and training resumes
            from it after a crash (deterministic replay).
        checkpoint_every_chunks: checkpoint cadence in merge chunks.
        use_fused_kernel: run the merge loop as the fused Pallas VMEM
            kernel (True), the XLA incremental path (False), or pick
            automatically by VMEM budget and backend (None). The fused
            kernel requires a TPU backend and is unavailable with
            checkpointing or data sharding.
        use_native_loop: run small workloads through the native C++ host
            merge loop (True), never (False), or pick automatically by
            estimated cost (None). Tiny corpora are latency-bound, not
            throughput-bound, so a device round-trip per merge chunk loses
            to a host loop; results are bit-identical either way. Ignored
            (device path) when sharding or checkpointing is configured.
        use_hbm_kernel: run large-vocabulary single-chip training through
            the HBM-tiled fused Pallas kernel (True), never (False), or
            pick automatically (None: TPU backend, problem within the
            kernel's i16/word-width/VMEM limits). This is the on-chip
            engine for the 32k-vocab flagship; beyond its limits the XLA
            bigvocab path runs instead. Unavailable with data sharding.
        spec_merges_per_round: batch this many merges per collective round
            in the data-sharded loop via speculate/validate epochs
            (dist/speculative.py) — the latency-tolerant mode for
            multi-host meshes. 0 = auto: 16 under jax.distributed with
            >1 processes, OFF on a single-host mesh. The regime boundary
            is deliberate: speculation trades redundant replicated
            compute (mispredicted merges are thrown-away word scans) for
            fewer collectives, which wins when a collective costs
            ~100 us-10 ms (DCN / gRPC between hosts) and loses when it
            costs ~10-20 us (ICI between chips of one host, where the
            lockstep one-collective-per-merge loop is already
            latency-cheap). 1 disables explicitly; >1 forces epochs on
            any 1D data mesh. Bit-identical results either way. Ignored
            (with a log warning) when vocab_shards > 1: epochs need the
            REPLICATED frozen count table for communication-free
            speculative selection, which 2D vocab-sharded meshes do not
            hold by construction.
    """

    vocab_size: int = 32000
    min_frequency: int = 2
    max_workers: int = 8
    chunk_size_bytes: int = 8 * 1024 * 1024
    seed: int = 42
    special_tokens: Sequence[str] = field(
        default_factory=lambda: ["[PAD]", "[UNK]", "[BOS]", "[EOS]"]
    )

    backend: str = "jax"
    count_strategy: str = "dense"
    merge_chunk_size: int = 256
    ingest_processes: bool | None = None
    align_chunks_to_newline: bool = False
    data_shards: int | None = None
    vocab_shards: int = 1
    # 11 GB admits GPT-2-scale vocabularies (50,257 -> a 10.5 GB [V, V]
    # table) on a 16 GB-HBM chip while still catching nonsense sizes.
    max_pair_table_bytes: int = 11 * 1024 * 1024 * 1024
    checkpoint_dir: str | None = None
    checkpoint_every_chunks: int = 4
    use_fused_kernel: bool | None = None
    use_native_loop: bool | None = None
    use_hbm_kernel: bool | None = None
    spec_merges_per_round: int = 0
    # Per-step cell-log capacity (128-cell rows) for the kernel-sharded
    # loop; the runtime clamps every plan against the kernel VMEM budget
    # and auto-doubles on overflow, so this is a tuning knob, not a
    # correctness one.
    hbm_sharded_cps: int = 64


__all__ = ["BBPETrainerConfig"]
