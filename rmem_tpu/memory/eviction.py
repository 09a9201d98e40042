"""RMem's importance-x-freshness slot eviction as a pure function.

Reference algorithm (aot_plus/networks/layers/transformer.py:324-436, invoked
from engines/aot_engine.py:350-369):

1. importance: layer-0 long-term attention mass per slot, recorded during the
   *propagate* call (so it covers the pre-append slots), weighted per query
   pixel by predicted foreground probability, summed over queries, normalized
   (transformer.py:339-353).
2. moving mean per frame id with factor 0.8 (transformer.py:356-375).
3. UCB freshness bonus 1.5*sqrt(log(sum(n)) / (n + 8)) where n counts eviction
   rounds survived; slot 0's count is pinned to the number of pre-append slots
   (transformer.py:377-402).
4. evict argmin over slots >= 1, never slot 0 (reference frame) nor the
   just-appended slot (transformer.py:404-411).
At train time the rule degenerates to FIFO at index `former_mem_len`
(transformer.py:335; aot_engine.py:366).

Everything here runs on fixed-shape arrays with a validity count, so it lives
inside the jitted per-frame step with zero host round-trips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rmem_tpu.memory.bank import MemoryBank, bank_compact

MOVING_MEAN_FACTOR = 0.8    # transformer.py:363
UCB_ADD = 8.0               # transformer.py:397
UCB_MUL = 1.5               # transformer.py:398
IGNORE_FORMER = 1           # transformer.py:405 (non-GRU path)
_INF = jnp.inf


def scored_drop_index(bank: MemoryBank, record_mass: jnp.ndarray,
                      fg_prob: jnp.ndarray, gru_memory: bool = False):
    """Compute (drop_idx, new_score, new_scored, new_times).

    record_mass: [B, HWq, S] per-slot attention mass from layer 0 of the last
      propagate (slots >= count-1 are garbage: the newest slot was appended
      after recording). Already head-averaged; sums to 1 over (slot, key)
      pairs per query.
    fg_prob: [B, HWq] predicted foreground probability at encoder resolution
      (aot_engine.py:355-362). Only B=1 matches the reference's eval-only
      assert (transformer.py:641); with B>1 we average mass over the batch.
    """
    capacity = bank.capacity
    n_after = bank.count              # slots after append
    n_old = n_after - 1               # slots covered by record_mass
    slot_ids = jnp.arange(capacity)
    old_mask = slot_ids < n_old

    # 1. foreground-weighted attention mass, normalized over old slots
    w = jnp.einsum("bqs,bq->s", record_mass.astype(jnp.float32),
                   fg_prob.astype(jnp.float32)) / record_mass.shape[0]
    w = jnp.where(old_mask, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w), 1e-12)

    # 2. moving mean (dict semantics: new frames get raw w)
    new_score = jnp.where(
        bank.scored, (1.0 - MOVING_MEAN_FACTOR) * bank.score
        + MOVING_MEAN_FACTOR * w, w)
    new_score = jnp.where(old_mask, new_score, bank.score)
    new_scored = bank.scored | old_mask

    # 3. UCB counts: every present slot (incl. the newest) survives one more
    #    round (transformer.py:378-388)
    new_times = jnp.where(slot_ids < n_after, bank.times + 1, bank.times)
    counts = jnp.where(old_mask, new_times.astype(jnp.float32), 0.0)
    counts = counts.at[0].set(n_old.astype(jnp.float32))  # pin ref slot
    if gru_memory:
        # slot 1 (compressed memory) is pinned too (transformer.py:394-396)
        counts = counts.at[1].set(n_old.astype(jnp.float32))
    total_counts = jnp.sum(counts)
    bonus = UCB_MUL * jnp.sqrt(jnp.log(total_counts)
                               / (counts + UCB_ADD))

    # 4. argmin over slots [ignore_former, n_old)
    ignore_former = IGNORE_FORMER + (1 if gru_memory else 0)
    candidates = (slot_ids >= ignore_former) & old_mask
    score_total = jnp.where(candidates, new_score + bonus, _INF)
    drop_idx = jnp.argmin(score_total).astype(jnp.int32)
    return drop_idx, new_score, new_scored, new_times


def evict_if_full(bank: MemoryBank, former_len: int, latter_len: int,
                  record_mass: Optional[jnp.ndarray] = None,
                  fg_prob: Optional[jnp.ndarray] = None,
                  use_attn_weight: bool = True) -> MemoryBank:
    """Run one eviction round iff count > former+latter (transformer.py:332).

    With `use_attn_weight=False` (training) drops FIFO at `former_len`.
    Jit-safe: both branches are computed and selected by `should`.
    """
    should = bank.count > (former_len + latter_len)

    if use_attn_weight:
        assert record_mass is not None and fg_prob is not None
        drop_idx, new_score, new_scored, new_times = scored_drop_index(
            bank, record_mass, fg_prob)
        stats_bank = bank.replace(
            score=jnp.where(should, new_score, bank.score),
            scored=jnp.where(should, new_scored, bank.scored),
            times=jnp.where(should, new_times, bank.times),
        )
    else:
        drop_idx = jnp.asarray(former_len, jnp.int32)
        stats_bank = bank

    evicted = bank_compact(stats_bank, drop_idx)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(should, a, b), evicted, stats_bank)


def update_bank_inplace(bank: MemoryBank, new_k: jnp.ndarray,
                        new_v: jnp.ndarray, do_write: jnp.ndarray,
                        former_len: int, latter_len: int,
                        record_mass: Optional[jnp.ndarray] = None,
                        fg_prob: Optional[jnp.ndarray] = None,
                        use_attn_weight: bool = True) -> MemoryBank:
    """Fused append+evict with order-indexed slots: ONE single-slot write.

    Semantically equivalent to `bank_append` followed by `evict_if_full`
    (the reference's cat-then-restrict, transformer.py:306-436), but slots
    never move: when the bank is full the new slot OVERWRITES the victim
    and temporal position is tracked in `bank.order`. Three costs vanish:

      - the compaction gather (two full-bank HBM passes every gap-th frame);
      - the lax.cond over the bank carry — the cond join copied the whole
        bank EVERY frame (~1.1 ms/frame at 480p, r3 ablation). Here the K/V
        update is an UNCONDITIONAL dynamic_update_slice of one slot, which
        XLA performs in place on the donated scan carry;
      - the transient capacity+1 state: steady-state count tops out at
        former+latter, so the spare physical slot (capacity-1) is never
        valid — frames with do_write=False dump their (finite, masked-out)
        write there instead of branching.

    The victim choice is computed PRE-append, which is equivalent: the
    reference's candidate set [ignore_former, n_old) excludes the slot it
    just appended, and the recorded attention mass covers exactly the
    pre-append slots (transformer.py:404-411,636-643).

    new_k: [L, B, HWpad, Ck] (token-padded to the bank slot width by the
    caller). record_mass/fg_prob as in scored_drop_index; with
    use_attn_weight=False eviction is FIFO at temporal rank `former_len`.
    """
    capacity = bank.capacity
    assert capacity > former_len + latter_len, (
        "order-indexed path needs the spare slot for no-op writes")
    slot_ids = jnp.arange(capacity)
    n_old = bank.count                       # pre-append valid slots
    is_full = n_old >= (former_len + latter_len)
    valid = slot_ids < n_old

    if use_attn_weight:
        assert record_mass is not None and fg_prob is not None
        # importance x freshness, keyed by PHYSICAL slot (stats never move
        # because slots never move; the reference's frame-id-keyed dicts
        # are reproduced by resetting a slot's stats when it is rewritten)
        w = jnp.einsum("bqs,bq->s", record_mass.astype(jnp.float32),
                       fg_prob.astype(jnp.float32)) / record_mass.shape[0]
        w = jnp.where(valid, w, 0.0)
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        new_score = jnp.where(
            bank.scored, (1.0 - MOVING_MEAN_FACTOR) * bank.score
            + MOVING_MEAN_FACTOR * w, w)
        new_score = jnp.where(valid, new_score, bank.score)
        new_scored = bank.scored | valid
        new_times = jnp.where(valid, bank.times + 1, bank.times)
        counts = jnp.where(valid, new_times.astype(jnp.float32), 0.0)
        # the reference slot is pinned; it is never a candidate so it never
        # moves — physical slot 0 IS temporal rank 0 forever
        counts = counts.at[0].set(n_old.astype(jnp.float32))
        bonus = UCB_MUL * jnp.sqrt(jnp.log(jnp.sum(counts))
                                   / (counts + UCB_ADD))
        candidates = (bank.order >= IGNORE_FORMER) & valid
        score_total = jnp.where(candidates, new_score + bonus, _INF)
        victim = jnp.argmin(score_total).astype(jnp.int32)
    else:
        # FIFO at temporal rank former_len (transformer.py:335): the victim
        # is the physical slot holding that rank
        victim = jnp.argmax(bank.order == former_len).astype(jnp.int32)
        new_score, new_scored, new_times = bank.score, bank.scored, bank.times

    target = jnp.where(is_full, victim, n_old)
    # no-op frames write the (finite) slot into the never-valid spare
    write_idx = jnp.where(do_write, target, capacity - 1)

    # --- [S]-sized metadata (all gated, negligible cost) ---------------
    victim_rank = bank.order[target]
    new_rank = jnp.where(is_full, n_old - 1, n_old)
    # close the rank gap among VALID slots only (the spare keeps its rank)
    dec = is_full & (bank.order > victim_rank) & (bank.order < n_old)
    order2 = jnp.where(dec, bank.order - 1, bank.order)
    order2 = jnp.where(slot_ids == target, new_rank, order2)
    new_order = jnp.where(do_write, order2, bank.order)

    # stats update only on eviction rounds (transformer.py:332 early-returns
    # when not full), and the rewritten slot starts fresh
    upd = do_write & is_full
    fresh = upd & (slot_ids == target)
    score_u = jnp.where(fresh, 0.0, jnp.where(upd, new_score, bank.score))
    scored_u = jnp.where(fresh, False,
                         jnp.where(upd, new_scored, bank.scored))
    times_u = jnp.where(fresh, 1, jnp.where(upd, new_times, bank.times))

    def put(arr, new):
        return jax.lax.dynamic_update_slice(
            arr, new[:, None].astype(arr.dtype), (0, write_idx, 0, 0, 0))

    return bank.replace(
        k=put(bank.k, new_k), v=put(bank.v, new_v),
        count=jnp.where(do_write & ~is_full, n_old + 1, n_old),
        score=score_u, scored=scored_u, times=times_u, order=new_order,
    )


def evict_if_full_gru(bank: MemoryBank, former_len: int, latter_len: int,
                      compress_fn, hid_k, hid_v,
                      record_mass: Optional[jnp.ndarray] = None,
                      fg_prob: Optional[jnp.ndarray] = None,
                      use_attn_weight: bool = True):
    """GRU_MEMORY eviction round (transformer.py:420-430): the evicted
    slot's K/V feed per-layer ConvGRUs whose outputs *replace slot 1* (the
    compressed memory) before compaction removes the evicted slot; hidden
    states persist. Returns (bank, hid_k, hid_v).

    compress_fn(k_slot, v_slot, hid_k, hid_v) -> (out_k, out_v, nhk, nhv)
    with slot tensors [L, B, HW, C] and hiddens [L, B, H, W, C].
    """
    should = bank.count > (former_len + latter_len)

    if use_attn_weight:
        assert record_mass is not None and fg_prob is not None
        drop_idx, new_score, new_scored, new_times = scored_drop_index(
            bank, record_mass, fg_prob, gru_memory=True)
        stats_bank = bank.replace(
            score=jnp.where(should, new_score, bank.score),
            scored=jnp.where(should, new_scored, bank.scored),
            times=jnp.where(should, new_times, bank.times),
        )
    else:
        drop_idx = jnp.asarray(former_len + 1, jnp.int32)
        stats_bank = bank

    k_slot = jnp.take(stats_bank.k, drop_idx, axis=1)
    v_slot = jnp.take(stats_bank.v, drop_idx, axis=1)
    ok, ov, nhk, nhv = compress_fn(k_slot, v_slot, hid_k, hid_v)
    compressed = stats_bank.replace(
        k=stats_bank.k.at[:, 1].set(ok.astype(stats_bank.k.dtype)),
        v=stats_bank.v.at[:, 1].set(ov.astype(stats_bank.v.dtype)),
    )
    evicted = bank_compact(compressed, drop_idx)
    new_bank = jax.tree_util.tree_map(
        lambda a, b: jnp.where(should, a, b), evicted, stats_bank)
    new_hid_k = jnp.where(should, nhk, hid_k)
    new_hid_v = jnp.where(should, nhv, hid_v)
    return new_bank, new_hid_k, new_hid_v
