"""Data-sharded merge loop with the Pallas kernel on every word shard.

Composes the HBM merge-loop kernel family with the multi-chip
speculative protocol: each chip holds ONE packed word shard (the
kernel's interleaved i16 layout, hbm_driver.pack_words) and the
replicated selection/validation state (the [V, V] count table, token
tables, lex ranks) lives in XLA. Per epoch:

1. **Select (replicated, no comm).** All chips deterministically pick
   the same k-merge speculative chain from the frozen global table —
   the same frozen-view selection + follow-up estimation as the XLA
   speculative loop (dist/speculative.py; selection semantics:
   /root/reference/src/yet_another_bpe/trainer.py:241-248).
2. **Replay + emit (per-chip Pallas dispatch).** Every chip replays the
   chain over its word shard in ONE kernel dispatch
   (kernels/replay_emit.py), logging per-step delta cells at fixed
   capacity (overflow flagged, never truncated into state).
3. **Exchange + validate (ONE all_gather per epoch).** A shard_map over
   the data mesh gathers the cell logs and replays selection against
   the TRUE evolving table; the longest overflow-free exact prefix
   commits (bitwise-identical results to the single-device loop).
4. **Commit.** Full-chain commits keep the kernel-applied shards;
   partial commits replay just the committed prefix over the
   epoch-start shards (a second kernel dispatch with the suffix rows
   masked — same compiled program).

Why this shape: exact BPE selection is a global argmax per merge, so a
chunk-granular kernel cannot run ahead of the collective exactly; the
speculative epoch amortizes one collective over k merges while the
kernel keeps the word-side scan/apply/emission on-chip in its packed
layout. Kernel dispatches are per-addressable-device (the standard
multi-host JAX pattern — under jax.distributed each process drives its
own chips); only the exchange/validate step runs under shard_map.

Scope: 1-D data meshes, vocab_cap <= 63488 (u16 bit-pattern symbol ids
in the packed i16 word table past 32768 — GPT-2's 50,257 included; the
selection/validation state is [V, V] 2D throughout so no flat V*V i32
index ever forms), word width <= 64.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from yabpe_tpu.core import lexkey
from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.dist.mesh import make_data_mesh, put_global
from yabpe_tpu.dist.speculative import estimate_followup_2d
from yabpe_tpu.kernels.replay_emit import (
    max_log_rows,
    replay_emit_chunk,
)
from yabpe_tpu.train.bigvocab import lazy_select_2d
from yabpe_tpu.train.hbm_driver import pack_words, initial_corner_counts
from yabpe_tpu.train.state import TrainState, vocab_update
from yabpe_tpu.utils.logging import get_logger

_LOG = get_logger(__name__)

#: Matches the single-chip HBM kernel: symbol ids are u16 bit patterns
#: in the packed i16 word table past 32768 (wide mode), and the
#: selection/validation state is [V, V] 2D throughout (no flat V*V i32
#: index ever forms), so GPT-2's 50,257 runs kernel-sharded too.
MAX_VOCAB_CAP = 63488
MAX_WORD_WIDTH = 64


class HbmShardedUnsupported(ValueError):
    """The problem violates a sharded-HBM-loop precondition."""


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def hbm_sharded_applicable(
    n_words: int,
    word_width: int,
    vocab_cap: int,
    data_shards: int = 1,
    processes: int = 1,
) -> bool:
    """Mirror of run_hbm_sharded_merge_loop's preconditions.

    Kept in sync with the runtime guards so the trainer's routing
    predicate never admits a problem the loop would then reject
    (ADVICE r4): vocab/width caps, enough shards for every process to
    hold one, and a minimum-capacity VMEM plan for the per-shard replay
    kernel.
    """
    if vocab_cap > MAX_VOCAB_CAP or max(word_width, 2) > MAX_WORD_WIDTH:
        return False
    if processes > max(data_shards, 1):
        return False
    W = max(word_width, 2)
    S = max(data_shards, 1)
    nrs = _round_up((n_words + S * 128 - 1) // (S * 128), 8)
    # the smallest useful log plan: cps0=32 + (k-1) * cps=8 at k=2
    return max_log_rows(nrs, (W + 2) * 128) >= 40


@partial(
    jax.jit,
    static_argnames=("k", "vocab_cap", "min_frequency", "num_merges"),
)
def _select_chain(
    counts: jax.Array,   # [V, V] i32 replicated
    row_max: jax.Array,  # [V] i32
    core: TrainState,
    ptr: jax.Array,
    *,
    k: int,
    vocab_cap: int,
    min_frequency: int,
    num_merges: int,
):
    """Speculative k-merge chain off the frozen table (replicated).

    Returns (A, B, C, ok) — ok[j] = 0 marks rows past an in-chain frozen
    stop or the merge budget (the kernel skips them; validation decides
    the REAL stop). The evolved view/bounds/token copies are discarded:
    validation maintains the true state.
    """
    V = vocab_cap

    def body(j, carry):
        gview, rmv, core_s, ok_chain, A, B, C, okf = carry
        in_range = ptr + j < num_merges
        left, right, cnt, rmv = lazy_select_2d(
            gview, rmv, core_s.lex_rank, V
        )
        frozen_stop = (cnt < max(min_frequency, 1)) | (cnt <= 0)
        do = in_range & ok_chain & ~frozen_stop
        core_s, new_sym = vocab_update(
            core_s, left, right, do, core_s.stopped,
            jnp.minimum(ptr + j, num_merges - 1), V,
        )
        gview, rmv = estimate_followup_2d(
            gview, rmv, left, right, cnt, new_sym, do, V
        )
        A = A.at[j].set(left)
        B = B.at[j].set(right)
        C = C.at[j].set(new_sym)
        okf = okf.at[j].set(do.astype(jnp.int32))
        return gview, rmv, core_s, do, A, B, C, okf

    z = jnp.zeros((k,), jnp.int32)
    _, _, _, _, A, B, C, okf = jax.lax.fori_loop(
        0, k, body,
        (counts, row_max, core, jnp.bool_(True), z, z, z, z),
    )
    return A, B, C, okf


def _validate_body(
    log_l, log_r, log_w,   # per-shard [K*cps, 128] i32
    ok_kernel,             # per-shard [1, K] i32
    A, B, C, ok_spec,      # [K] i32 replicated
    counts, row_max, core, ptr,
    *,
    k: int,
    cps: int,
    cps0: int,
    vocab_cap: int,
    min_frequency: int,
    num_merges: int,
    replay: bool = False,
):
    """shard_map body: gather cell logs, commit the exact prefix.

    ``replay=True`` is the checkpoint-resume path: (a, b) come from the
    recorded merges instead of live selection (BPE training is fully
    deterministic, so the record IS the training state — the same
    contract as the single-chip kernel's replay mode), and the stop
    logic is skipped (recorded merges were all committed once already).
    All count/vocab maintenance is identical.
    """
    V = vocab_cap
    g_l = jax.lax.all_gather(log_l, "data")  # [S, cps0+(K-1)*cps, 128]
    g_r = jax.lax.all_gather(log_r, "data")
    g_w = jax.lax.all_gather(log_w, "data")
    g_ok = jax.lax.all_gather(ok_kernel, "data").reshape(-1, k)  # [S, K]
    nsh = g_ok.shape[0]

    def val_step(j, carry, lj, rj, wj):
        counts, rm, core_v, p, valid, stopped = carry
        in_range = ptr + j < num_merges
        if replay:
            a_t, b_t = A[j], B[j]
            true_stop = jnp.bool_(False)
        else:
            a_t, b_t, cnt_t, rm = lazy_select_2d(
                counts, rm, core_v.lex_rank, V
            )
            true_stop = (cnt_t < max(min_frequency, 1)) | (cnt_t <= 0)
        ok_all = (
            jnp.min(jax.lax.dynamic_slice(g_ok, (0, j), (nsh, 1))) > 0
        ) & (ok_spec[j] > 0)
        match = (
            valid & in_range & ~true_stop & ok_all
            & (a_t == A[j]) & (b_t == B[j])
        )
        stopped = stopped | (valid & in_range & true_stop)
        core_v, _ = vocab_update(
            core_v, a_t, b_t, match, stopped,
            jnp.minimum(ptr + j, num_merges - 1), V,
        )
        # 2D (row, col) scatter: no flat l * V + r index (i32-safe past
        # the 46340 flat bound — wide vocabularies included). Dead cells
        # route to row V and drop.
        live = match & (lj >= 0)
        rows_i = jnp.where(live, lj, V)
        cols_i = jnp.where(live, rj, 0)
        counts = counts.at[rows_i, cols_i].add(wj, mode="drop")
        safe_r = jnp.minimum(rows_i, V - 1)
        vals = jnp.where(live, counts[safe_r, cols_i], -1)
        rm = rm.at[safe_r].max(vals)
        p = p + match.astype(jnp.int32)
        return counts, rm, core_v, p, match, stopped

    carry = (
        counts, row_max, core, jnp.int32(0), jnp.bool_(True),
        jnp.bool_(False),
    )
    # step 0 unrolled at its larger cps0 log capacity
    carry = val_step(
        jnp.int32(0), carry,
        g_l[:, :cps0, :].reshape(-1),
        g_r[:, :cps0, :].reshape(-1),
        g_w[:, :cps0, :].reshape(-1),
    )

    def val_body(j, carry):
        lj = jax.lax.dynamic_slice(
            g_l, (0, cps0 + (j - 1) * cps, 0), (nsh, cps, 128)
        ).reshape(-1)
        rj = jax.lax.dynamic_slice(
            g_r, (0, cps0 + (j - 1) * cps, 0), (nsh, cps, 128)
        ).reshape(-1)
        wj = jax.lax.dynamic_slice(
            g_w, (0, cps0 + (j - 1) * cps, 0), (nsh, cps, 128)
        ).reshape(-1)
        return val_step(j, carry, lj, rj, wj)

    counts, rm, core_v, p, _, stopped = jax.lax.fori_loop(
        1, k, val_body, carry
    )
    core_v = core_v._replace(stopped=stopped)
    return counts, rm, core_v, p


def run_hbm_sharded_merge_loop(
    table: WordTable,
    base_vocab: Vocab,
    *,
    vocab_cap: int,
    num_merges: int,
    min_frequency: int,
    data_shards: int,
    spec_batch: int = 16,
    cps: int = 64,
    interpret: bool = False,
    stats_out: dict | None = None,
    resume: tuple[np.ndarray, int] | None = None,
    on_chunk=None,
) -> np.ndarray:
    """Run the merge loop with a per-chip replay/emission kernel.

    Returns the [num_merges, 3] merge record, bitwise-identical to the
    single-device loop for any shard count. ``cps`` is the per-step
    cell-log capacity in 128-cell rows; steps past it fall back to a
    single-merge dispatch at k-fold capacity (and error only if even
    that overflows).

    ``resume`` is a ``(merges_ids, steps_done)`` checkpoint (see
    yabpe_tpu.train.checkpoint): the first ``steps_done`` recorded
    merges REPLAY through the same kernel dispatch + validate fold with
    selection skipped, rebuilding the exact sharded device state before
    live training continues. ``on_chunk(merges_ids, steps_done)`` fires
    after every live epoch (the trainer's saver applies its cadence).
    """
    if vocab_cap > MAX_VOCAB_CAP:
        raise HbmShardedUnsupported(
            f"vocab_cap {vocab_cap} > {MAX_VOCAB_CAP} (u16 packed ids); "
            "use the 2D vocab-sharded XLA loop"
        )
    if max(table.width, 2) > MAX_WORD_WIDTH:
        raise HbmShardedUnsupported(
            f"word width {table.width} > {MAX_WORD_WIDTH}"
        )
    k = max(2, int(spec_batch))
    S = data_shards
    mesh = make_data_mesh(S)
    devices = list(mesh.devices.reshape(-1))
    # Multi-process placement: every process holds the same globally
    # unioned word table (dist/ingest), builds only the shards of ITS
    # addressable devices, and dispatches the kernel on those; the
    # exchange/validate shard_map then assembles the per-device cell
    # logs into one global data-sharded array — the standard multi-host
    # JAX data flow.
    proc = jax.process_index()
    local = [d for d in range(S) if devices[d].process_index == proc]
    if not local:
        raise HbmShardedUnsupported(
            f"process {proc} holds no devices of the {S}-shard data mesh"
        )
    base_tokens = list(base_vocab.tokens())
    b0 = len(base_tokens)
    V = vocab_cap
    W = max(table.width, 2)
    L = _round_up(max(table.width, base_vocab.max_token_len(), 2), 8)

    # ---- word shards: contiguous row ranges, equal packed size
    n = table.words.shape[0]
    nrs = _round_up((n + S * 128 - 1) // (S * 128), 8)  # packed rows/shard
    rows_per = nrs * 128
    shards = []  # aligned with ``local``
    for d in local:
        lo = min(d * rows_per, n)
        hi = min(lo + rows_per, n)
        words = np.full((rows_per, table.words.shape[1]), -1, np.int32)
        freqs = np.zeros((rows_per,), np.int64)
        if hi > lo:
            words[: hi - lo] = table.words[lo:hi]
            freqs[: hi - lo] = table.freqs[lo:hi]
        sub = WordTable(
            words=words, freqs=freqs, num_words=hi - lo,
            max_len=table.max_len,
        )
        shards.append(
            jax.device_put(jnp.asarray(pack_words(sub)), devices[d])
        )

    # ---- replicated selection/validation state
    wide = V > 32768  # u16 bit-pattern symbol ids in the packed table
    corner = initial_corner_counts(table, b0)
    counts_np = np.zeros((V, V), np.int32)
    counts_np[:b0, :b0] = corner
    token_bytes, token_len = lexkey.initial_token_matrix(base_tokens, V, L)
    repl = NamedSharding(mesh, P())
    counts = put_global(counts_np, repl)
    row_max = put_global(counts_np.max(axis=1), repl)
    core = TrainState(
        words=jnp.zeros((1, 2), jnp.int32),  # word side lives in the kernel
        freqs=jnp.zeros((1,), jnp.int32),
        token_bytes=jnp.asarray(token_bytes),
        token_len=jnp.asarray(token_len),
        lex_rank=jnp.asarray(lexkey.initial_lex_ranks(base_tokens, V)),
        next_id=jnp.asarray(b0, jnp.int32),
        stopped=jnp.asarray(False),
        merges=jnp.full((max(num_merges, 1), 3), -1, jnp.int32),
        num_done=jnp.asarray(0, jnp.int32),
    )
    core = put_global(core, jax.tree.map(lambda _: repl, core))

    # per-step cell-log capacity: merge 0 of each epoch gets cps0 rows
    # (a window visit costs >= 8 rows, so heavy merges need roughly the
    # shard's packed-row count), later steps cps rows each. Every log
    # plan is clamped against the kernel's VMEM budget BEFORE dispatch
    # (ADVICE r4: the overflow fallback used to quadruple cps0 unchecked).
    cap_rows = max_log_rows(nrs, (W + 2) * 128)
    if cap_rows < (k - 1) * cps + 32:
        raise HbmShardedUnsupported(
            f"word shard ({nrs} packed rows) leaves no VMEM for the cell "
            f"logs (max {cap_rows} rows < k*cps plan); raise data_shards "
            "or use the XLA sharded loop"
        )
    cps0 = _round_up(min(max(4 * cps, 2 * nrs), 8192), 8)
    cps0 = min(cps0, cap_rows - (k - 1) * cps)
    validate_fns: dict[tuple[int, int, int, bool], object] = {}

    def validate_for(kk: int, cc: int, cc0: int, replay: bool = False):
        if (kk, cc, cc0, replay) not in validate_fns:
            validate_fns[(kk, cc, cc0, replay)] = jax.jit(
                shard_map(
                    partial(
                        _validate_body,
                        k=kk,
                        cps=cc,
                        cps0=cc0,
                        vocab_cap=V,
                        min_frequency=min_frequency,
                        num_merges=num_merges,
                        replay=replay,
                    ),
                    mesh=mesh,
                    in_specs=(
                        P("data", None), P("data", None), P("data", None),
                        P("data", None),
                        P(), P(), P(), P(), P(), P(),
                        jax.tree.map(lambda _: P(), core), P(),
                    ),
                    out_specs=(P(), P(),
                               jax.tree.map(lambda _: P(), core), P()),
                    check_vma=False,
                )
            )
        return validate_fns[(kk, cc, cc0, replay)]

    def glog(parts, rows):
        """Assemble per-device [rows, 128] logs into a [S*rows, 128]
        data-sharded global array (zero-copy; the standard multi-host
        construction — each process contributes its local shards)."""
        return jax.make_array_from_single_device_arrays(
            (S * rows, 128),
            NamedSharding(mesh, P("data", None)),
            parts,
        )

    def gok(parts, kk):
        return jax.make_array_from_single_device_arrays(
            (S, kk),
            NamedSharding(mesh, P("data", None)),
            [p.reshape(1, kk) for p in parts],
        )

    def dispatch(words_list, chain_np, cc, cc0):
        chain = jnp.asarray(chain_np)
        outs = []
        for i, d in enumerate(local):
            outs.append(
                replay_emit_chunk(
                    words_list[i],
                    jax.device_put(chain, devices[d]),
                    word_width=W,
                    cps=cc,
                    cps0=cc0,
                    wide=wide,
                    interpret=interpret,
                )
            )
        return outs

    ptr = 0
    epochs = 0
    fallbacks = 0
    replay_n = 0
    merges_rec = None
    if resume is not None:
        merges_rec, steps_done = resume
        replay_n = max(0, min(int(steps_done), num_merges))
    state = (counts, row_max, core)
    while ptr < num_merges and not bool(state[2].stopped):
        in_replay = ptr < replay_n
        if in_replay:
            kk = min(k, replay_n - ptr)
            A_np = np.zeros((k,), np.int32)
            B_np = np.zeros((k,), np.int32)
            C_np = np.zeros((k,), np.int32)
            A_np[:kk] = merges_rec[ptr : ptr + kk, 0]
            B_np[:kk] = merges_rec[ptr : ptr + kk, 1]
            C_np[:kk] = merges_rec[ptr : ptr + kk, 2]
            ok_np = (np.arange(k) < kk).astype(np.int32)
            A = jnp.asarray(A_np)
            B = jnp.asarray(B_np)
            C = jnp.asarray(C_np)
            okf = jnp.asarray(ok_np)
        else:
            A, B, C, okf = _select_chain(
                state[0], state[1], state[2], jnp.asarray(ptr, jnp.int32),
                k=k, vocab_cap=V, min_frequency=min_frequency,
                num_merges=num_merges,
            )
            A_np, B_np, C_np, ok_np = (
                np.asarray(A), np.asarray(B), np.asarray(C),
                np.asarray(okf),
            )
        m_active = int(ok_np.sum())
        chain_np = np.full((k, 128), -1, np.int32)
        chain_np[:, 0] = np.where(ok_np > 0, A_np, -1)
        chain_np[:, 1] = B_np
        chain_np[:, 2] = C_np

        rows = cps0 + (k - 1) * cps
        outs = dispatch(shards, chain_np, cps, cps0)
        counts2, rm2, core2, p = validate_for(k, cps, cps0, in_replay)(
            glog([o[1] for o in outs], rows),
            glog([o[2] for o in outs], rows),
            glog([o[3] for o in outs], rows),
            gok([o[4] for o in outs], k),
            A, B, C, okf,
            state[0], state[1], state[2],
            jnp.asarray(ptr, jnp.int32),
        )
        p = int(p)
        epochs += 1
        if p == 0 and not bool(core2.stopped):
            # merge 0's cells overflowed cps0 rows on some shard: run
            # that single merge alone, doubling the log capacity until it
            # fits or the kernel VMEM plan is exhausted (then the caller
            # falls back to the XLA sharded loop — never a dead-end error
            # the user can't act on, ADVICE r4).
            fallbacks += 1
            fb_cap = cap_rows - cps
            cps0_fb = min(4 * cps0, fb_cap)
            chain1 = chain_np[:2].copy()
            chain1[1, 0] = -1  # k=2 keeps the kernel shape family tiny
            while True:
                outs = dispatch(shards, chain1, cps, cps0_fb)
                counts2, rm2, core2, p = validate_for(
                    2, cps, cps0_fb, in_replay
                )(
                    glog([o[1] for o in outs], cps0_fb + cps),
                    glog([o[2] for o in outs], cps0_fb + cps),
                    glog([o[3] for o in outs], cps0_fb + cps),
                    gok([o[4] for o in outs], 2),
                    jnp.asarray(A_np[:2]), jnp.asarray(B_np[:2]),
                    jnp.asarray(C_np[:2]),
                    jnp.asarray(np.array([ok_np[0], 0], np.int32)),
                    state[0], state[1], state[2],
                    jnp.asarray(ptr, jnp.int32),
                )
                p = int(p)
                if p > 0 or bool(core2.stopped):
                    break
                if cps0_fb >= fb_cap:
                    raise HbmShardedUnsupported(
                        "merge delta exceeds the largest VMEM-feasible "
                        f"cell log ({cps0_fb} rows/shard); raise "
                        "data_shards or use the XLA sharded loop"
                    )
                cps0_fb = min(2 * cps0_fb, fb_cap)
            m_active = min(m_active, 1)
        state = (counts2, rm2, core2)
        if p >= m_active and m_active > 0:
            shards = [o[0] for o in outs]  # full applied chain committed
        elif p > 0:
            commit = chain_np.copy()
            commit[p:, 0] = -1
            outs_c = dispatch(shards, commit, cps, cps0)
            shards = [o[0] for o in outs_c]
        ptr += p
        if on_chunk is not None and not in_replay:
            on_chunk(np.asarray(state[2].merges), min(ptr, num_merges))
        if p == 0 and bool(state[2].stopped):
            break

    if stats_out is not None:
        stats_out["epochs"] = epochs
        stats_out["fallbacks"] = fallbacks
        stats_out["merges_done"] = ptr
    _LOG.info(
        "hbm-sharded loop: %d merges in %d epochs (%.2f commits/epoch, "
        "%d fallbacks) over %d shards",
        ptr, epochs, ptr / max(epochs, 1), fallbacks, S,
    )
    return np.asarray(state[2].merges)


__all__ = [
    "run_hbm_sharded_merge_loop",
    "hbm_sharded_applicable",
    "HbmShardedUnsupported",
]
