"""Driver for the HBM-tiled fused merge-loop kernel (32k-vocab on-chip).

Host-side state construction + chunked dispatch for
yabpe_tpu.kernels.hbm_loop. Packs the word table into the kernel's
interleaved 16-bit layout, builds the initial pair-count table cheaply
(initial symbols are all byte/special ids, so the nonzero region is a
[base, base] corner — computed with one numpy bincount and placed into a
device-zeroed [V, V] buffer; no giant host->device transfer and no XLA
scatter), then runs merge chunks until done or early-stopped.

Exactness target: /root/reference/src/yet_another_bpe/trainer.py:216-302
(same selection order, application, dedup and stop semantics); pinned by
the golden-fixture and differential-fuzz suites.
"""

from __future__ import annotations

import numpy as np

from yabpe_tpu.core import lexkey
from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class HbmKernelUnsupported(ValueError):
    """The problem violates an HBM-kernel exactness precondition."""


#: Symbol ids are u16 bit patterns in the i16 word table (65535 = the
#: empty sentinel), and the flush's slab-presence bitmask holds 31 slabs
#: of 2048 columns — so the vocabulary caps at 31 * 2048 = 63488, which
#: covers GPT-2's 50,257 on-device. Word width caps at 64 symbols
#: (changed-cell buffers).
MAX_VOCAB_CAP = 63488
MAX_WORD_WIDTH = 64
#: VMEM plan budget (the kernel compiles with a 110 MB limit; the rest
#: is slack for Mosaic temporaries) and the HBM budget for the word
#: table + [V, V] count table (v5e carries 16 GB).
_VMEM_BUDGET = 100 * 1024 * 1024
_HBM_BUDGET = 12 * 1024**3


def _vmem_estimate(
    nr: int, W: int, V: int, L: int, *, words_in_vmem: bool,
    A: int = 512, F: int = 128, chunk: int = 2048,
    nr2: int = 0, W2: int = 0,
) -> int:
    """Kernel VMEM plan in bytes (mirrors hbm_loop's scratch shapes).

    ``nr2``/``W2`` describe the optional wide width bucket (0 = absent);
    the dummy second-bucket scratches cost a few KB either way.
    """
    total = (
        2 * F * V * 4              # pending columns (2 f32 limbs)
        + V * 128 * 4              # eviction block
        + 2 * L * V * 4            # token_bytes in+out windows
        + 2 * 8 * V * 4            # two count-row windows
        + 7 * V * 4                # addvecs + pendrow/pendpos/pendany
        + 3 * A * 128 * 4          # stage
        + chunk * 128 * 4          # merge-record ring
    )
    for nr_b, w_b in ((nr, W), (max(nr2, 8), max(W2, 2))):
        total += (
            nr_b * 128 * 4 + nr_b * 4    # flags + per-row any-flag
            + 8 * (w_b + 2) * 128 * 2    # gather window
        )
        if words_in_vmem:
            total += 2 * nr_b * (w_b + 2) * 128 * 2  # aliased in+out
        else:
            total += 2 * 256 * (w_b + 2) * 128 * 2   # streaming buffers
    return total


def hbm_mode(
    n_words: int, word_width: int, vocab_cap: int, max_token_len: int
) -> str | None:
    """How the HBM kernel can run this problem on one chip.

    'vmem': word table VMEM-resident (the fast path); 'hbm': word table
    streamed from HBM (lifts the table cap to the 1 GB-corpus scale);
    None: outside the kernel's limits (the XLA bigvocab engine takes it).
    """
    if vocab_cap > MAX_VOCAB_CAP or word_width > MAX_WORD_WIDTH:
        return None
    W = max(word_width, 2)
    V = _round_up(max(vocab_cap, 2), 2048 if vocab_cap > 2048 else 128)
    L = _round_up(max(W, max_token_len, 2), 8)
    F = pending_cols_for(V)
    nr = _round_up((n_words + 127) // 128, 8)
    if _vmem_estimate(nr, W, V, L, words_in_vmem=True, F=F) <= _VMEM_BUDGET:
        return "vmem"
    nr_h = _round_up(nr, 256)
    if (
        _vmem_estimate(nr_h, W, V, L, words_in_vmem=False, F=F)
        > _VMEM_BUDGET
    ):
        return None
    hbm_bytes = nr_h * (W + 2) * 128 * 2 + 4 * V * V
    if hbm_bytes > _HBM_BUDGET:
        return None
    return "hbm"


def hbm_applicable(
    n_words: int, word_width: int, vocab_cap: int, max_token_len: int
) -> bool:
    """Whether the HBM kernel can run this problem on one chip."""
    return hbm_mode(n_words, word_width, vocab_cap, max_token_len) is not None


def plan_buckets(
    table: WordTable, vocab_cap: int, max_token_len: int
):
    """Width-bucket the table and pick the kernel's word placement.

    Returns ``(t_n, t_w, W, W2, words_in_hbm)`` — ``t_w``/``W2`` are
    None/0 for a single bucket, ``words_in_hbm`` is None when the
    problem exceeds the kernel's VMEM/HBM budgets even split. The single
    source of truth for both the trainer's routing predicate and
    run_hbm_merge_loop (they must never disagree, ADVICE r4).
    """
    if vocab_cap > MAX_VOCAB_CAP or max(table.width, 2) > MAX_WORD_WIDTH:
        return None, None, 0, 0, None
    b0_floor = 2
    V = _round_up(
        max(vocab_cap, b0_floor), 2048 if vocab_cap > 2048 else 128
    )
    L = _round_up(max(table.width, max_token_len, 2), 8)
    split = bucket_split(table)
    if split is not None:
        w1, mask = split
        lengths = (table.words >= 0).sum(axis=1)
        w2 = max(int(lengths.max(initial=0)), 2)
        t_n = WordTable(
            words=np.ascontiguousarray(table.words[mask][:, :w1]),
            freqs=np.ascontiguousarray(table.freqs[mask]),
            num_words=int(mask.sum()),
            max_len=w1,
        )
        t_w = WordTable(
            words=np.ascontiguousarray(table.words[~mask][:, :w2]),
            freqs=np.ascontiguousarray(table.freqs[~mask]),
            num_words=int((~mask).sum()),
            max_len=w2,
        )
    else:
        t_n, t_w = table, None
    W = max(t_n.width, 2)
    W2 = max(t_w.width, 2) if t_w is not None else 0

    def _rows(t, mult: int) -> int:
        if t is None:
            return 0
        return _round_up((t.words.shape[0] + 127) // 128, mult)

    F = pending_cols_for(V)
    if (
        _vmem_estimate(
            _rows(t_n, 8), W, V, L, words_in_vmem=True, F=F,
            nr2=_rows(t_w, 8), W2=W2,
        )
        <= _VMEM_BUDGET
    ):
        return t_n, t_w, W, W2, False
    nr1_h, nr2_h = _rows(t_n, 256), _rows(t_w, 256)
    fits_stream = (
        _vmem_estimate(
            nr1_h, W, V, L, words_in_vmem=False, F=F, nr2=nr2_h, W2=W2,
        )
        <= _VMEM_BUDGET
    )
    hbm_bytes = (
        nr1_h * (W + 2) * 128 * 2
        + nr2_h * (W2 + 2) * 128 * 2
        + 4 * V * V
    )
    if not fits_stream or hbm_bytes > _HBM_BUDGET:
        return t_n, t_w, W, W2, None
    return t_n, t_w, W, W2, True


def hbm_applicable_table(
    table: WordTable, vocab_cap: int, max_token_len: int
) -> bool:
    """Split-aware admission test (the trainer's routing predicate)."""
    return plan_buckets(table, vocab_cap, max_token_len)[4] is not None


def bucket_split(table: WordTable) -> tuple[int, np.ndarray] | None:
    """Pick a narrow-bucket width for the two-bucket word layout.

    Most words are short (English pretokens average ~5 bytes), but the
    packed table pays the FULL corpus max width per row, so the per-step
    scan/stream/visit cost scales with the longest word. Splitting the
    table into a narrow bucket (width w1) and a wide remainder cuts that
    cost roughly in half at 1 GB scale. Returns ``(w1, narrow_mask)``
    minimizing total packed row-blocks, or None when the split saves
    less than ~8% (the second bucket's fixed overhead isn't free).
    """
    words = table.words
    n = words.shape[0]
    if n == 0:
        return None
    lengths = (words >= 0).sum(axis=1)
    w_full = max(int(lengths.max()), 2)
    if w_full <= 4:
        return None

    def nrows(x: int) -> int:
        return _round_up((x + 127) // 128, 8)

    base_cost = nrows(n) * (w_full + 2)
    hist = np.bincount(np.minimum(lengths, w_full), minlength=w_full + 1)
    cum = np.cumsum(hist)
    best = (base_cost, 0, 0)
    for w1 in range(2, w_full):
        n1 = int(cum[w1])
        if n1 == 0 or n1 == n:
            continue
        cost = nrows(n1) * (w1 + 2) + nrows(n - n1) * (w_full + 2)
        if cost < best[0]:
            best = (cost, w1, n1)
    cost, w1, _ = best
    if w1 == 0 or cost >= 0.92 * base_cost:
        return None
    return w1, lengths <= w1


def pending_cols_for(V: int) -> int:
    """Pending-column slots: halved past 32k vocab so the two-limb f32
    buffer (2F x V) stays within the VMEM plan at GPT-2-scale V."""
    return 128 if V <= 32768 else 64


def pack_words(table: WordTable, row_multiple: int = 8) -> np.ndarray:
    """Pack [N, W] int32 rows into the interleaved [NR, (W+2)*128] i16
    layout (symbol w of word j at row j//128, lane w*128 + j%128; freq
    limbs in blocks W, W+1)."""
    words = table.words
    freqs = table.freqs.astype(np.int64)
    if freqs.max(initial=0) > np.iinfo(np.int32).max:
        raise ValueError("word frequency exceeds int32")
    n, w = words.shape
    w = max(w, 2)
    nr = _round_up((n + 127) // 128, row_multiple)
    sym = np.full((nr * 128, w), -1, dtype=np.int16)
    sym[:n, : words.shape[1]] = words.astype(np.int16)
    f = np.zeros((nr * 128,), dtype=np.int64)
    f[:n] = freqs
    lo = (f & 0xFFFF).astype(np.uint16).view(np.int16)
    hi = (f >> 16).astype(np.uint16).view(np.int16)
    cols = np.concatenate([sym, lo[:, None], hi[:, None]], axis=1)
    # [NR*128, W+2] -> [NR, 128, W+2] -> [NR, W+2, 128] -> [NR, (W+2)*128]
    packed = (
        cols.reshape(nr, 128, w + 2)
        .transpose(0, 2, 1)
        .reshape(nr, (w + 2) * 128)
    )
    return np.ascontiguousarray(packed)


def initial_corner_counts(
    table: WordTable, base_size: int
) -> np.ndarray:
    """Initial pair counts as a [base, base] corner (all initial symbols
    are byte/special ids < base_size)."""
    words = table.words
    l = words[:, :-1]
    r = words[:, 1:]
    valid = l >= 0
    valid &= r >= 0
    keys = np.where(valid, l.astype(np.int64) * base_size + r, 0)
    wts = np.where(valid, table.freqs[:, None].astype(np.int64), 0)
    corner = np.bincount(
        keys.ravel(), weights=wts.ravel(), minlength=base_size * base_size
    )
    corner = corner.reshape(base_size, base_size)
    if corner.max(initial=0) > np.iinfo(np.int32).max:
        raise ValueError("pair count exceeds int32")
    return corner.astype(np.int32)


def run_hbm_merge_loop(
    table: WordTable,
    base_vocab: Vocab,
    *,
    vocab_cap: int,
    num_merges: int,
    min_frequency: int,
    chunk_size: int = 2048,
    interpret: bool = False,
    on_chunk=None,
    resume: tuple[np.ndarray, int] | None = None,
    ablate: int = 0,
    force_words_in_hbm: bool | None = None,
) -> np.ndarray:
    """Run the merge loop on the HBM kernel; returns [num_merges, 3] ids.

    The word table is VMEM-resident when it fits (``hbm_mode`` ==
    'vmem'), else streamed from HBM ('hbm' — the 1 GB-corpus scale).
    ``force_words_in_hbm`` overrides the automatic placement (tests).

    ``resume`` is a ``(merges_ids, steps_done)`` checkpoint (see
    yabpe_tpu.train.checkpoint): the first ``steps_done`` recorded merges
    are REPLAYED through the kernel (selection skipped, all state updates
    identical), rebuilding the exact device state before live training
    continues — the same deterministic-restart contract as the XLA
    engines (SURVEY.md §5.3/5.4).
    """
    import jax
    import jax.numpy as jnp

    from yabpe_tpu.kernels.hbm_loop import hbm_merge_chunk

    base_tokens = list(base_vocab.tokens())
    b0 = len(base_tokens)
    if vocab_cap > MAX_VOCAB_CAP or max(table.width, 2) > MAX_WORD_WIDTH:
        raise HbmKernelUnsupported(
            "problem exceeds the HBM kernel's limits "
            f"(vocab <= {MAX_VOCAB_CAP}, word width <= {MAX_WORD_WIDTH})"
        )
    # Round to a 2048 multiple above 2048 so the kernel's one-hot slab is
    # the full 2048 lanes (a ragged V forces a narrow slab and an
    # unrolled slab loop).
    V = _round_up(max(vocab_cap, b0), 2048 if vocab_cap > 2048 else 128)
    L = _round_up(max(table.width, base_vocab.max_token_len(), 2), 8)
    chunk = max(1, min(chunk_size, num_merges))
    # The per-chunk merge-record ring flushes [chunk, 4] rows at a time;
    # size the record buffer to a whole number of chunks.
    M = _round_up(max(num_merges, 1), chunk)

    # ---- width buckets (r5): narrow words packed at their own width
    F = pending_cols_for(V)
    t_n, t_w, W, W2, auto_hbm = plan_buckets(
        table, vocab_cap, base_vocab.max_token_len()
    )
    if force_words_in_hbm is None:
        if auto_hbm is None:
            raise HbmKernelUnsupported(
                "problem exceeds the HBM kernel's capacity "
                "(VMEM plan / HBM budget)"
            )
        words_in_hbm = auto_hbm
    else:
        words_in_hbm = force_words_in_hbm

    mult = 256 if words_in_hbm else 8
    packed = pack_words(t_n, row_multiple=mult)
    if t_w is not None:
        packed2 = pack_words(t_w, row_multiple=mult)
    else:
        packed2 = np.full((8, 4 * 128), -1, np.int16)
    # Pair counts up to 2^31 are exact: the kernel's pending-column
    # accumulator stores two 12-bit-split f32 limbs per slot.
    corner_np = initial_corner_counts(table, b0)
    token_bytes, token_len = lexkey.initial_token_matrix(base_tokens, V, L)
    lex_rank = lexkey.initial_lex_ranks(base_tokens, V)

    corner = jnp.asarray(corner_np)

    @jax.jit
    def build_counts(corner):
        counts = jnp.zeros((V, V), jnp.int32)
        return jax.lax.dynamic_update_slice(counts, corner, (0, 0))

    counts = build_counts(corner)
    row_max_np = np.zeros((1, V), dtype=np.int32)
    row_max_np[0, :b0] = corner_np.max(axis=1)

    replay_until = 0
    merges_buf = np.full((M, 128), -1, np.int32)
    if resume is not None:
        merges_ids, steps_done = resume
        replay_until = max(0, min(int(steps_done), num_merges))
        merges_buf[:replay_until, :3] = merges_ids[:replay_until]

    state = (
        jnp.asarray(packed),
        jnp.asarray(packed2),
        jnp.asarray(row_max_np),
        jnp.asarray(np.ascontiguousarray(token_bytes.T)),  # [L, V]
        jnp.asarray(token_len.reshape(1, V)),
        jnp.asarray(lex_rank.reshape(1, V)),
        jnp.asarray(merges_buf),
        jnp.asarray(
            np.array([[b0, 0, 0, 0, 0, 0, 0, 0]], dtype=np.int32)
        ),
        counts,
    )

    # Read back only the [num_merges, 3] id triples: slicing on DEVICE
    # keeps the per-chunk transfer at 12*num_merges bytes instead of the
    # whole 512*M-byte record buffer (the remote link stalls per byte).
    slice_ids = jax.jit(
        lambda m: jax.lax.slice(m, (0, 0), (num_merges, 3))
    )

    start = 0
    while start < num_merges:
        cfg = jnp.asarray(
            np.array([[start, replay_until, 0, 0]], dtype=np.int32)
        )
        state = hbm_merge_chunk(
            *state,
            cfg,
            vocab_cap=V,
            word_width=W,
            word_width2=W2,
            byte_width=L,
            num_merges=num_merges,
            chunk_size=chunk,
            min_frequency=min_frequency,
            pending_cols=F,
            interpret=interpret,
            words_in_hbm=words_in_hbm,
            # the dense early merges have the same many-cells-per-step
            # shape as streaming mode; the wide histogram tier pays off
            # there and only there in VMEM mode (PERFORMANCE.md r5)
            wide_hist=start == 0,
            ablate=ablate,
        )
        start += chunk
        scal = np.asarray(state[7])
        if on_chunk is not None:
            merges_now = np.asarray(slice_ids(state[6]))
            on_chunk(merges_now, min(start, num_merges))
        if scal[0, 1] != 0:  # stopped
            break
    return np.asarray(slice_ids(state[6]))


__all__ = [
    "run_hbm_merge_loop",
    "HbmKernelUnsupported",
    "hbm_applicable",
    "hbm_applicable_table",
    "hbm_mode",
    "plan_buckets",
    "bucket_split",
    "pack_words",
    "initial_corner_counts",
    "MAX_VOCAB_CAP",
    "MAX_WORD_WIDTH",
]
