"""Fixed-capacity long/short-term memory bank with static shapes.

The reference stores long-term memory as Python lists of `[T, HW, B, C]`
tensors that grow by `torch.cat` and shrink by slicing
(aot_plus/networks/layers/transformer.py:242,306-322,413-434). On TPU a
dynamic T axis would force a recompile per bank size, so we preallocate
`S = former + latter + 1` slots (the +1 absorbs the transient
append-then-evict state, transformer.py:319,332-334) and track a validity
`count`. Appends are `dynamic_update_slice` writes; eviction is a gather
compaction that preserves temporal order, exactly mirroring the reference's
delete-one-slot semantics.

Layouts are TPU-first: slot axis leading, tokens x channels minor
(`[L, S, B, HW, C]`) so bank attention reads are contiguous [HW, C] tiles.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class MemoryBank:
    """Long-term memory across all LSTT/GPM layers + eviction statistics.

    k: [L, S, B, HW, Ck]; v: [L, S, B, HW, Cv]. For DeAOT, `v` stores the
    visual and identity value planes CONCATENATED on the channel axis
    ([V, ID_V], Cv = 2*expand_d): bank attention reads them jointly
    (transformer.py:1180-1184), and storing the read layout moves the
    [S,B,HW,2C] concat from every frame (0.23 ms/frame at 481x849, r3
    profile) to the once-per-gap memory write. `count` is the number of
    valid slots.

    Eviction stats are slot-aligned and compacted together with k/v, which
    reproduces the reference's frame-index-keyed dicts
    (transformer.py:356-402):
      score:  moving-mean attention mass per slot (factor 0.8)
      scored: whether `score` holds a value (dict-membership equivalent)
      times:  eviction rounds survived (UCB visit counts)

    `order` maps physical slot -> temporal rank (always a permutation of
    0..S-1; valid slots hold ranks 0..count-1). Under the compaction path
    (bank_append + bank_compact) physical order equals temporal order, so
    `order` stays `arange` and is never touched. The order-indexed
    inference path (eviction.update_bank_inplace) instead replaces evicted
    slots IN PLACE and tracks temporal position here — bank attention is
    slot-order invariant once the per-slot temporal PE is gathered by
    `order` (see ops.attention._slot_pe_bias factoring).
    """

    k: jnp.ndarray
    v: jnp.ndarray
    count: jnp.ndarray        # scalar int32
    score: jnp.ndarray        # [S] float32
    scored: jnp.ndarray       # [S] bool
    times: jnp.ndarray        # [S] int32
    order: jnp.ndarray        # [S] int32 physical slot -> temporal rank

    @property
    def capacity(self) -> int:
        return self.k.shape[1]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]


@flax.struct.dataclass
class ShortTermMemory:
    """Previous-frame memory per layer (short_term_mem_skip=1 window,
    transformer.py:293-299). k: [L, B, HW, Ck], v: [L, B, HW, Cv]."""

    k: jnp.ndarray
    v: jnp.ndarray


def init_bank(num_layers: int, capacity: int, batch: int, hw: int,
              ck: int, cv: int, dtype=jnp.float32) -> MemoryBank:
    zeros = lambda c: jnp.zeros((num_layers, capacity, batch, hw, c), dtype)
    return MemoryBank(
        k=zeros(ck),
        v=zeros(cv),
        count=jnp.zeros((), jnp.int32),
        score=jnp.zeros((capacity,), jnp.float32),
        scored=jnp.zeros((capacity,), bool),
        times=jnp.zeros((capacity,), jnp.int32),
        order=jnp.arange(capacity, dtype=jnp.int32),
    )


def valid_slot_mask(bank: MemoryBank) -> jnp.ndarray:
    """[S] bool — slots < count hold data."""
    return jnp.arange(bank.capacity) < bank.count


def bank_append(bank: MemoryBank, new_k: jnp.ndarray, new_v: jnp.ndarray
                ) -> MemoryBank:
    """Write a new slot at index `count` (transformer.py:306-322's cat).

    new_k: [L, B, HW, Ck]. Assumes count < capacity, which the engine
    guarantees by evicting back to former+latter after every append.
    Assumes physical order == temporal order (`order[count] == count`),
    which holds everywhere this is used (fresh or compaction-path banks);
    the order-indexed path appends through update_bank_inplace instead.
    """
    idx = bank.count

    def put(arr, new):
        return jax.lax.dynamic_update_slice(
            arr, new[:, None].astype(arr.dtype), (0, idx, 0, 0, 0))

    return bank.replace(
        k=put(bank.k, new_k),
        v=put(bank.v, new_v),
        count=bank.count + 1,
    )


def _compact_axis(arr: jnp.ndarray, drop_idx: jnp.ndarray, axis: int
                  ) -> jnp.ndarray:
    """Remove one slot along `axis`, shifting later slots down (gather)."""
    s = arr.shape[axis]
    i = jnp.arange(s)
    src = jnp.where(i < drop_idx, i, jnp.minimum(i + 1, s - 1))
    return jnp.take(arr, src, axis=axis)


def bank_compact(bank: MemoryBank, drop_idx: jnp.ndarray) -> MemoryBank:
    """Delete slot `drop_idx`, preserving temporal order
    (transformer.py:432-434). All slot-aligned stats move with the data;
    stats of vacated slots are reset so re-used slots start fresh (the
    reference's dicts are keyed by unique frame index, so a new slot never
    inherits an old slot's statistics)."""
    new_count = bank.count - 1
    fresh = jnp.arange(bank.capacity) < new_count
    return bank.replace(
        k=_compact_axis(bank.k, drop_idx, 1),
        v=_compact_axis(bank.v, drop_idx, 1),
        count=new_count,
        score=jnp.where(fresh, _compact_axis(bank.score, drop_idx, 0), 0.0),
        scored=fresh & _compact_axis(bank.scored, drop_idx, 0),
        times=jnp.where(fresh, _compact_axis(bank.times, drop_idx, 0), 0),
    )
