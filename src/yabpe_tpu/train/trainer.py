"""Training orchestration: files -> ingestion -> device merge loop -> model.

Public-surface parity target: /root/reference/src/yet_another_bpe/
trainer.py:55-117 (BBPETrainer.train/save, empty-corpus short-circuit,
input validation). The merge loop itself runs on device
(yabpe_tpu.train.state), optionally sharded across a mesh
(yabpe_tpu.dist), with a numpy host-oracle backend for cross-checks.
"""

from __future__ import annotations

import time
from collections.abc import Sequence
from pathlib import Path

import numpy as np

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.io.native import save_model
from yabpe_tpu.pretok.ingest import count_pretokens
from yabpe_tpu.train.config import BBPETrainerConfig
from yabpe_tpu.train.model import BBPEModel
from yabpe_tpu.train.reference_loop import train_merges_oracle
from yabpe_tpu.utils.logging import get_logger

_LOG = get_logger(__name__)


class BBPETrainer:
    """Byte-level BPE trainer with a device-resident merge loop."""

    def __init__(self, config: BBPETrainerConfig | None = None) -> None:
        self.config: BBPETrainerConfig = config or BBPETrainerConfig()
        self._vocab: dict[bytes, int] = {}
        self._merges: list[tuple[bytes, bytes]] = []
        self.last_stats: dict[str, float] = {}

    def train(self, files: Sequence[str | Path]) -> BBPEModel:
        """Train a BBPE model from one or more UTF-8 text files."""
        if not files:
            raise ValueError("At least one file must be provided")
        cfg = self.config

        # Training owns this process's hot allocation path: opt in to the
        # arena-friendly glibc tuning here (NOT at library import).
        from yabpe_tpu.utils.hostmem import tune_malloc

        tune_malloc()

        base = Vocab.base(cfg.special_tokens)
        num_merges = max(0, cfg.vocab_size - len(base))

        # Raw ingest fast path: when the native merge loop may take the
        # workload, keep the word table as exported arrays end to end (no
        # per-word Python byte strings).
        raw = None
        counter = None
        t0 = time.perf_counter()
        if cfg.backend == "jax" and self._multihost():
            # Cross-host corpus sharding: each host ingests its file shard,
            # tables are all-gathered and unioned identically on every host
            # (yabpe_tpu.dist.ingest).
            from yabpe_tpu.dist.ingest import count_pretokens_global

            raw = count_pretokens_global(
                files,
                cfg.special_tokens,
                chunk_size_bytes=cfg.chunk_size_bytes,
                max_workers=cfg.max_workers,
                align_to_newline=cfg.align_chunks_to_newline,
            )
        elif cfg.backend == "jax" and self._native_loop_candidate():
            from yabpe_tpu.pretok.ingest import count_pretokens_raw

            raw = count_pretokens_raw(
                files,
                cfg.special_tokens,
                chunk_size_bytes=cfg.chunk_size_bytes,
                max_workers=cfg.max_workers,
                align_to_newline=cfg.align_chunks_to_newline,
            )
        if raw is None:
            counter = count_pretokens(
                files,
                cfg.special_tokens,
                chunk_size_bytes=cfg.chunk_size_bytes,
                max_workers=cfg.max_workers,
                align_to_newline=cfg.align_chunks_to_newline,
                use_processes=cfg.ingest_processes,
            )
        t_ingest = time.perf_counter() - t0

        if raw is not None:
            blob, lens, counts = raw
            n_unique = len(lens)
            corpus_bytes = int(np.dot(lens.astype(np.int64), counts))
        else:
            n_unique = len(counter)
            corpus_bytes = sum(len(w) * c for w, c in counter.items())

        if n_unique == 0:
            self._vocab = base.as_bytes_to_id()
            self._merges = []
            return BBPEModel(
                vocab=self._vocab, merges=[], special_tokens=list(cfg.special_tokens)
            )

        t0 = time.perf_counter()
        if cfg.backend == "numpy":
            vocab, merges = train_merges_oracle(
                counter, cfg.special_tokens, cfg.vocab_size, cfg.min_frequency
            )
        elif cfg.backend == "jax":
            if raw is not None and self._should_use_native_loop(
                n_unique, num_merges
            ):
                from yabpe_tpu import native

                merges = (
                    native.train_host_raw(
                        blob, lens, counts, num_merges, cfg.min_frequency
                    )
                    if num_merges > 0
                    else []
                )
                vocab = Vocab()
                for tok in base.tokens():
                    vocab.add(tok)
                for left, right in merges:
                    vocab.add(left + right)
            else:
                if counter is None:
                    from yabpe_tpu.pretok.ingest import counter_from_raw

                    counter = counter_from_raw(blob, lens, counts)
                vocab, merges = self._train_device(counter, base)
        else:
            raise ValueError(f"unknown backend {cfg.backend!r}")
        t_merge = time.perf_counter() - t0

        self.last_stats = {
            "ingest_seconds": t_ingest,
            "merge_seconds": t_merge,
            "corpus_bytes": float(corpus_bytes),
            "unique_pretokens": float(n_unique),
            "num_merges": float(len(merges)),
            "bytes_per_second": corpus_bytes / max(t_ingest + t_merge, 1e-9),
        }
        _LOG.info(
            "trained %d merges in %.3fs (ingest %.3fs, %.2f MB/s end-to-end)",
            len(merges),
            t_merge,
            t_ingest,
            self.last_stats["bytes_per_second"] / 1e6,
        )

        self._vocab = vocab.as_bytes_to_id()
        self._merges = merges
        return BBPEModel(
            vocab=self._vocab,
            merges=self._merges,
            special_tokens=list(cfg.special_tokens),
        )

    def _train_device(
        self, counter, base: Vocab
    ) -> tuple[Vocab, list[tuple[bytes, bytes]]]:
        from yabpe_tpu.train import state as train_state

        cfg = self.config
        num_merges = max(0, cfg.vocab_size - len(base))
        if num_merges == 0:
            return base, []

        vocab_cap = max(cfg.vocab_size, len(base))
        table_bytes = 4 * vocab_cap * vocab_cap // max(1, cfg.vocab_shards)
        if table_bytes > cfg.max_pair_table_bytes:
            raise ValueError(
                f"dense pair table would need {table_bytes} bytes for "
                f"vocab_cap={vocab_cap}; raise max_pair_table_bytes or lower "
                "vocab_size"
            )

        table = WordTable.from_counter(counter)

        if cfg.data_shards and cfg.data_shards > 1:
            if self._should_use_hbm_sharded(table, vocab_cap):
                from yabpe_tpu.dist.hbm_sharded import (
                    HbmShardedUnsupported,
                    run_hbm_sharded_merge_loop,
                )
                from yabpe_tpu.utils.jaxsetup import effective_backend

                spec = cfg.spec_merges_per_round
                resume, saver = self._checkpoint_hooks()
                try:
                    merges_ids = run_hbm_sharded_merge_loop(
                        table,
                        base,
                        vocab_cap=vocab_cap,
                        num_merges=num_merges,
                        min_frequency=cfg.min_frequency,
                        data_shards=cfg.data_shards,
                        spec_batch=spec if spec > 1 else 16,
                        cps=cfg.hbm_sharded_cps,
                        interpret=effective_backend() != "tpu",
                        resume=resume,
                        on_chunk=saver,
                    )
                    return train_state.merges_to_bytes(merges_ids, base)
                except HbmShardedUnsupported as e:
                    # Deterministic loop: restarting from scratch on the
                    # XLA sharded engine yields the identical merge list.
                    _LOG.warning(
                        "kernel-sharded loop unsupported mid-run (%s); "
                        "falling back to the XLA sharded loop", e,
                    )
            from yabpe_tpu.dist.sharded import run_sharded_merge_loop

            resume, saver = self._checkpoint_hooks()
            spec = cfg.spec_merges_per_round
            if spec == 0 and self._multihost():
                spec = 16  # auto: latency-tolerant epochs across hosts
            merges_ids = run_sharded_merge_loop(
                table,
                base,
                vocab_cap=vocab_cap,
                num_merges=num_merges,
                min_frequency=cfg.min_frequency,
                data_shards=cfg.data_shards,
                vocab_shards=cfg.vocab_shards,
                chunk_size=cfg.merge_chunk_size,
                resume=resume,
                on_chunk=saver,
                spec_batch=spec,
            )
        else:
            merges_ids = self._run_single_device(
                table, base, vocab_cap, num_merges
            )

        return train_state.merges_to_bytes(merges_ids, base)

    def _checkpoint_hooks(self):
        """(resume, saver) for checkpointed runs, (None, None) otherwise.

        ``resume`` is the loaded (merges_ids, steps_done) tuple or None;
        ``saver`` is an on_chunk callback enforcing the configured save
        cadence.
        """
        cfg = self.config
        if not cfg.checkpoint_dir:
            return None, None
        from yabpe_tpu.train import checkpoint as ckpt

        resume = ckpt.load_checkpoint(cfg.checkpoint_dir, cfg)
        if resume is not None:
            _LOG.info("resuming from checkpoint at merge %d", resume[1])
        every = max(1, cfg.checkpoint_every_chunks)
        chunks_seen = [0]

        def saver(merges_ids, steps_done):
            chunks_seen[0] += 1
            if chunks_seen[0] % every == 0:
                ckpt.save_checkpoint(
                    cfg.checkpoint_dir, merges_ids, steps_done, cfg
                )

        return resume, saver

    def _multihost(self) -> bool:
        """True when running under jax.distributed with >1 processes (and
        the native scanner is available for the raw-table exchange)."""
        from yabpe_tpu import native

        if not native.available():
            return False
        try:
            import jax

            return jax.process_count() > 1
        except Exception:
            return False

    def _native_loop_candidate(self) -> bool:
        """Config-level eligibility for the C++ host merge loop."""
        cfg = self.config
        if cfg.use_native_loop is False:
            return False
        if (cfg.data_shards and cfg.data_shards > 1) or cfg.checkpoint_dir:
            return False  # distributed / checkpointed runs stay on device

        from yabpe_tpu import native

        return native.available()

    def _should_use_native_loop(self, n_unique: int, num_merges: int) -> bool:
        """Route auto-engine single-host runs to the C++ host merge loop.

        Re-derived from measured per-step costs (PERFORMANCE.md, round
        5): the native lazy-max-heap loop costs ~28 us/step at 388k
        unique words (100 MB @ 32k) and ~60 us/step at ~3.9M uniques
        (1 GB); the HBM Pallas kernel costs ~0.27 ms/step flat with the
        word table VMEM-resident and ~0.6 ms/step at 3.9M uniques in
        words-in-HBM streaming mode (down from 7.9 ms in round 4 — the
        two-tier flush histogram). Extrapolating the native slope
        (~+9 us per 1M uniques), the single-chip crossover sits at
        ~25M+ uniques — beyond the VMEM mode's admission bound, and the
        streaming mode's per-step cost grows with the same corpus-size
        slope, so it never crosses on ONE chip. Every feasible
        single-chip auto workload routes to the host on merit; the
        multi-chip break-even (per-chip shard cost + one collective per
        speculative epoch vs the host's single-core ceiling) is derived
        in PERFORMANCE.md §crossover. The device engines carry
        distributed and checkpointed runs (routed earlier, where the
        host loop has no shard/replay story) and explicit opt-ins
        (``use_native_loop=False`` / ``use_hbm_kernel=True``).

        An earlier cost-product threshold (``num_merges * 8 * n_unique <
        3e11``) mis-routed 1 GB-scale corpora to the then-30x-slower
        device streaming mode once round 4 lifted the kernel's admission
        caps; the signature keeps ``n_unique``/``num_merges`` for a
        future multi-chip crossover model.
        """
        del n_unique, num_merges
        return self._native_loop_candidate()

    def _run_single_device(
        self, table: WordTable, base: Vocab, vocab_cap: int, num_merges: int
    ) -> np.ndarray:
        import jax.numpy as jnp

        from yabpe_tpu.train import state as train_state

        from yabpe_tpu.train import checkpoint as ckpt
        from yabpe_tpu.train import incremental as inc

        cfg = self.config
        from yabpe_tpu.utils.jaxsetup import effective_backend

        count_strategy = train_state.resolve_count_strategy(
            cfg.count_strategy, table, vocab_cap, effective_backend()
        )
        if self._should_use_fused(table, vocab_cap):
            from yabpe_tpu.train.fused_driver import run_fused_merge_loop

            return run_fused_merge_loop(
                table,
                base,
                vocab_cap=vocab_cap,
                num_merges=num_merges,
                min_frequency=cfg.min_frequency,
                chunk_size=cfg.merge_chunk_size,
            )

        if self._should_use_hbm(table, vocab_cap):
            from yabpe_tpu.train.hbm_driver import (
                HbmKernelUnsupported,
                run_hbm_merge_loop,
            )

            resume, saver = self._checkpoint_hooks()
            try:
                return run_hbm_merge_loop(
                    table,
                    base,
                    vocab_cap=vocab_cap,
                    num_merges=num_merges,
                    min_frequency=cfg.min_frequency,
                    # Each dispatch pays a host<->device round trip
                    # (~40 ms through this link); the HBM kernel is built
                    # for long chunks.
                    chunk_size=max(cfg.merge_chunk_size, 2048),
                    on_chunk=saver,
                    resume=resume,
                    # A forced HBM run off-TPU (tests, CPU dry runs) uses
                    # the Pallas interpreter — same kernel logic, no chip.
                    interpret=effective_backend() != "tpu",
                )
            except HbmKernelUnsupported as e:
                _LOG.info(
                    "HBM kernel unavailable (%s); using the bigvocab "
                    "engine", e,
                )

        if vocab_cap > 2048:
            # Large vocabularies: HBM count table + lazy row-max selection
            # (O(V) per step instead of an O(V^2) full-table argmax).
            from yabpe_tpu.train.bigvocab import run_bigvocab_merge_loop

            resume, saver = self._checkpoint_hooks()
            return run_bigvocab_merge_loop(
                table,
                base,
                vocab_cap=vocab_cap,
                num_merges=num_merges,
                min_frequency=cfg.min_frequency,
                chunk_size=cfg.merge_chunk_size,
                resume=resume,
                on_chunk=saver,
                count_strategy=count_strategy,
            )

        chunk = max(1, min(cfg.merge_chunk_size, num_merges))
        resume, saver = self._checkpoint_hooks()
        start = 0
        if resume is not None:
            merges_ids, steps_done = resume
            start = min(int(steps_done), num_merges)
            core = ckpt.resume_state(
                table, base, vocab_cap, num_merges, merges_ids, start
            )
        else:
            core = train_state.init_state(table, base, vocab_cap, num_merges)

        state = inc.IncState(
            core=core,
            counts=inc.init_counts(
                core.words,
                core.freqs,
                vocab_cap=vocab_cap,
                count_strategy=count_strategy,
            ),
        )
        affected_cap = inc.pick_affected_cap(int(core.words.shape[0]))

        while start < num_merges:
            state = inc.merge_chunk_incremental(
                state,
                jnp.asarray(start, dtype=jnp.int32),
                vocab_cap=vocab_cap,
                min_frequency=cfg.min_frequency,
                num_merges=num_merges,
                chunk_size=chunk,
                affected_cap=affected_cap,
                count_strategy=count_strategy,
            )
            start += chunk
            if saver is not None:
                saver(np.asarray(state.core.merges), min(start, num_merges))
            if bool(state.core.stopped):
                break
        return np.asarray(state.core.merges)

    def _should_use_hbm_sharded(self, table, vocab_cap: int) -> bool:
        """Route multi-chip runs to the per-chip replay/emission kernel.

        The sharded-HBM loop (dist/hbm_sharded.py) composes the Pallas
        kernel family with the data-sharded speculative protocol.
        Explicit opt-in only (``use_hbm_kernel=True`` with
        ``data_shards > 1``): its dispatch-per-epoch structure is built
        for locally-attached multi-chip hosts, and this sandbox has one
        chip — the XLA sharded loop stays the measured multi-chip
        default. Vocab-sharded runs stay on the XLA loop ([V/nv, V]
        slabs); checkpointed and multi-process runs are supported here
        since round 5 (kernel-level replay resume / per-process shard
        placement).
        """
        cfg = self.config
        if cfg.use_hbm_kernel is not True:
            return False
        if (cfg.vocab_shards or 1) > 1:
            return False
        import jax

        from yabpe_tpu.dist.hbm_sharded import hbm_sharded_applicable

        if not hbm_sharded_applicable(
            int(table.words.shape[0]),
            int(table.words.shape[1]),
            vocab_cap,
            data_shards=cfg.data_shards,
            processes=jax.process_count(),
        ):
            if jax.process_count() > cfg.data_shards:
                return False  # not enough shards to span the processes
            raise ValueError(
                "use_hbm_kernel=True with data_shards > 1 but the problem "
                "exceeds the sharded-HBM loop's limits (vocab <= 63488, "
                "word width <= 64, per-shard VMEM plan)"
            )
        return True

    def _should_use_hbm(self, table, vocab_cap: int) -> bool:
        """Route large-vocabulary problems to the HBM-tiled Pallas kernel.

        The kernel carries the single-chip 32k-vocab flagship; the XLA
        bigvocab loop remains the fallback past its i16/word-width limits
        and the resume engine for checkpointed restarts.
        """
        cfg = self.config
        if cfg.use_hbm_kernel is False:
            return False
        from yabpe_tpu.train.hbm_driver import hbm_applicable_table

        fits = hbm_applicable_table(
            table, vocab_cap, max(table.width, 2)
        )
        if cfg.use_hbm_kernel is True:
            if not fits:
                raise ValueError(
                    "use_hbm_kernel=True but the problem exceeds the HBM "
                    "kernel's limits (vocab <= 63488, word width <= 64, "
                    "word table within HBM)"
                )
            return True
        from yabpe_tpu.utils.jaxsetup import effective_backend

        return fits and effective_backend() == "tpu"

    def _should_use_fused(self, table, vocab_cap: int) -> bool:
        cfg = self.config
        if cfg.use_fused_kernel is False:
            return False
        if cfg.checkpoint_dir:
            return False  # resume path is wired to the XLA state layout
        from yabpe_tpu.train.fused_driver import fused_applicable

        import jax

        fits = fused_applicable(
            int(table.words.shape[0]),
            int(table.words.shape[1]),
            vocab_cap,
            max(table.width, 2),
        )
        if cfg.use_fused_kernel is True:
            if not fits:
                raise ValueError(
                    "use_fused_kernel=True but the problem exceeds the "
                    "kernel's VMEM budget"
                )
            return True
        from yabpe_tpu.utils.jaxsetup import effective_backend

        return fits and effective_backend() == "tpu"

    def save(self, output_dir: str | Path) -> None:
        """Persist the trained model to disk (native latin-1 dialect)."""
        if not self._vocab:
            raise ValueError("Model has not been trained yet. Call train() first.")
        save_model(output_dir, self._vocab, self._merges, self.config.special_tokens)


__all__ = ["BBPETrainer"]
