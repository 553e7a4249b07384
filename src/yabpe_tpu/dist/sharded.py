"""Data-parallel sharded merge loop: shard_map + psum over the mesh.

SPMD layout (north star, BASELINE.json):

- word rows + frequencies: sharded over the ``data`` mesh axis;
- token table, lex ranks, merge record: replicated (every device applies
  identical updates — the argmax inputs are identical after the psum, so
  replicated state stays bitwise-equal by construction);
- per-step pair counts: computed locally, reduced with ``jax.lax.psum``
  over ``data`` (integer adds commute, so the result — and therefore the
  whole training run — is exactly shard-count invariant).

The reference's only parallelism is thread-pooled ingestion
(/root/reference/src/yet_another_bpe/trainer.py:201-213); this module is
the device-parallel training layer it never had.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from yabpe_tpu.core.vocab import Vocab
from yabpe_tpu.core.wordtable import WordTable
from yabpe_tpu.dist.mesh import make_data_mesh
from yabpe_tpu.kernels.pair_count import pair_counts_dense
from yabpe_tpu.train.state import TrainState, init_state, merge_step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def state_partition_specs() -> TrainState:
    """PartitionSpec per TrainState leaf (data-sharded words, rest replicated)."""
    return TrainState(
        words=P("data", None),
        freqs=P("data"),
        token_bytes=P(),
        token_len=P(),
        lex_rank=P(),
        next_id=P(),
        stopped=P(),
        merges=P(),
        num_done=P(),
    )


def _sharded_chunk(
    state: TrainState,
    chunk_start: jax.Array,
    *,
    vocab_cap: int,
    min_frequency: int,
    num_merges: int,
    chunk_size: int,
) -> TrainState:
    """Chunk body running per-device inside shard_map."""

    def body(i, st):
        step = chunk_start + i
        in_range = step < num_merges
        local_counts = pair_counts_dense(st.words, st.freqs, vocab_cap)
        counts = jax.lax.psum(local_counts, "data")
        st_next = merge_step(
            st,
            jnp.minimum(step, num_merges - 1),
            vocab_cap=vocab_cap,
            min_frequency=min_frequency,
            counts=counts,
        )
        return jax.tree.map(lambda a, b: jnp.where(in_range, a, b), st_next, st)

    return jax.lax.fori_loop(0, chunk_size, body, state)


def run_sharded_merge_loop(
    table: WordTable,
    base_vocab: Vocab,
    *,
    vocab_cap: int,
    num_merges: int,
    min_frequency: int,
    data_shards: int,
    chunk_size: int = 256,
) -> np.ndarray:
    """Run the merge loop data-parallel over ``data_shards`` devices.

    Returns the [num_merges, 3] merge record (host numpy), identical to the
    single-device loop's output for any shard count.
    """
    mesh = make_data_mesh(data_shards)
    table = table.pad_rows_to(_round_up(table.words.shape[0], data_shards))
    state = init_state(table, base_vocab, vocab_cap, num_merges)

    specs = state_partition_specs()
    state = jax.device_put(
        state,
        jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                     is_leaf=lambda x: isinstance(x, P)),
    )

    chunk = max(1, min(chunk_size, num_merges))
    fn = jax.jit(
        shard_map(
            partial(
                _sharded_chunk,
                vocab_cap=vocab_cap,
                min_frequency=min_frequency,
                num_merges=num_merges,
                chunk_size=chunk,
            ),
            mesh=mesh,
            in_specs=(specs, P()),
            out_specs=specs,
            check_rep=False,
        ),
        donate_argnums=(0,),
    )

    start = 0
    while start < num_merges:
        state = fn(state, jnp.asarray(start, dtype=jnp.int32))
        start += chunk
        if bool(state.stopped):
            break
    return np.asarray(state.merges)


__all__ = ["run_sharded_merge_loop", "state_partition_specs"]
