"""Memory bank + eviction semantics vs a list-based simulation of the
reference rule (transformer.py:306-436), written independently here."""

import jax
import jax.numpy as jnp
import numpy as np

from rmem_tpu.memory import (MemoryBank, bank_append, bank_compact,
                             evict_if_full, init_bank, valid_slot_mask)

L, B, HW, CK, CV = 2, 1, 6, 4, 4
FORMER, LATTER = 1, 3
CAP = FORMER + LATTER + 1


def _new_slot(rng):
    return (rng.randn(L, B, HW, CK).astype(np.float32),
            rng.randn(L, B, HW, CV).astype(np.float32))


def test_append_and_valid_mask():
    rng = np.random.RandomState(0)
    bank = init_bank(L, CAP, B, HW, CK, CV)
    k0, v0 = _new_slot(rng)
    bank = bank_append(bank, jnp.asarray(k0), jnp.asarray(v0))
    assert int(bank.count) == 1
    np.testing.assert_array_equal(np.asarray(bank.k[:, 0]), k0)
    assert list(np.asarray(valid_slot_mask(bank))) == [True] + [False] * 4
    k1, v1 = _new_slot(rng)
    bank = bank_append(bank, jnp.asarray(k1), jnp.asarray(v1))
    np.testing.assert_array_equal(np.asarray(bank.k[:, 1]), k1)
    np.testing.assert_array_equal(np.asarray(bank.k[:, 0]), k0)  # untouched


def test_compact_preserves_order():
    rng = np.random.RandomState(1)
    bank = init_bank(L, CAP, B, HW, CK, CV)
    slots = [_new_slot(rng) for _ in range(4)]
    for k, v in slots:
        bank = bank_append(bank, jnp.asarray(k), jnp.asarray(v))
    bank = bank_compact(bank, jnp.int32(1))
    assert int(bank.count) == 3
    np.testing.assert_array_equal(np.asarray(bank.k[:, 0]), slots[0][0])
    np.testing.assert_array_equal(np.asarray(bank.k[:, 1]), slots[2][0])
    np.testing.assert_array_equal(np.asarray(bank.k[:, 2]), slots[3][0])


def test_fifo_eviction_training_path():
    """Train path drops index former_mem_len (aot_engine.py:366)."""
    rng = np.random.RandomState(2)
    bank = init_bank(L, CAP, B, HW, CK, CV)
    slots = [_new_slot(rng) for _ in range(CAP)]
    for k, v in slots:
        bank = bank_append(bank, jnp.asarray(k), jnp.asarray(v))
    bank = evict_if_full(bank, FORMER, LATTER, use_attn_weight=False)
    assert int(bank.count) == FORMER + LATTER
    np.testing.assert_array_equal(np.asarray(bank.k[:, 0]), slots[0][0])
    np.testing.assert_array_equal(np.asarray(bank.k[:, 1]), slots[2][0])


def test_no_eviction_when_not_full():
    rng = np.random.RandomState(3)
    bank = init_bank(L, CAP, B, HW, CK, CV)
    for _ in range(3):
        k, v = _new_slot(rng)
        bank = bank_append(bank, jnp.asarray(k), jnp.asarray(v))
    out = evict_if_full(bank, FORMER, LATTER, use_attn_weight=False)
    assert int(out.count) == 3
    np.testing.assert_array_equal(np.asarray(out.k), np.asarray(bank.k))


class _ReferenceSim:
    """List/dict simulation of restrict_long_memories (transformer.py:324-436).

    Importance x freshness with moving-mean dict keyed by frame index and UCB
    counts; evicts argmin over slots >= 1.
    """

    def __init__(self):
        self.frames = []          # frame index per slot (temporal order)
        self.score_dict = {}
        self.times_dict = {}

    def append(self, frame_idx):
        self.frames.append(frame_idx)

    def evict(self, w_old):
        """w_old: normalized fg-weighted mass per pre-append slot."""
        n_old = len(self.frames) - 1
        assert len(w_old) == n_old
        w = np.asarray(w_old, np.float64)
        w = w / w.sum()
        for i in range(n_old):
            f = self.frames[i]
            if f in self.score_dict:
                self.score_dict[f] = 0.2 * self.score_dict[f] + 0.8 * w[i]
            else:
                self.score_dict[f] = w[i]
        for f in self.frames:
            self.times_dict[f] = self.times_dict.get(f, 0) + 1
        counts = np.array([self.times_dict[f] for f in self.frames[:-1]],
                          np.float64)
        counts[0] = n_old
        bonus = 1.5 * np.sqrt(np.log(counts.sum()) / (counts + 8.0))
        total = np.array([self.score_dict[self.frames[i]] for i in
                          range(n_old)]) + bonus
        drop = int(np.argmin(total[1:])) + 1
        dropped_frame = self.frames.pop(drop)
        return drop, dropped_frame


def test_scored_eviction_matches_reference_sim():
    rng = np.random.RandomState(4)
    bank = init_bank(L, CAP, B, HW, CK, CV)
    sim = _ReferenceSim()
    frame2slot = {}

    n_appends = 12
    for f in range(n_appends):
        k, v = _new_slot(rng)
        frame2slot[f] = k
        bank = bank_append(bank, jnp.asarray(k), jnp.asarray(v))
        sim.append(f)
        n_old = int(bank.count) - 1
        if int(bank.count) > FORMER + LATTER:
            # synth per-query per-slot record mass + fg prob
            rec = rng.rand(B, HW, CAP).astype(np.float32)
            rec[..., n_old:] = 777.0  # garbage beyond old slots must be ignored
            fg = rng.rand(B, HW).astype(np.float32)
            bank = evict_if_full(bank, FORMER, LATTER,
                                 record_mass=jnp.asarray(rec),
                                 fg_prob=jnp.asarray(fg),
                                 use_attn_weight=True)
            w_old = (rec[..., :n_old] * fg[..., None]).sum(axis=(0, 1))
            drop, dropped = sim.evict(w_old)
            assert int(bank.count) == FORMER + LATTER
        # bank slot contents must match sim's surviving frame list
        for slot_i, frame_i in enumerate(sim.frames):
            np.testing.assert_array_equal(
                np.asarray(bank.k[:, slot_i]), frame2slot[frame_i],
                err_msg=f"slot {slot_i} after frame {f}")


def _rank_to_phys(bank):
    """rank -> physical slot index from the order permutation."""
    return np.argsort(np.asarray(bank.order))


def _assert_logical_equal(bank_p, bank_c, check_stats=True):
    """In-place (order-indexed) bank == compaction bank, rank-aligned."""
    assert int(bank_p.count) == int(bank_c.count)
    phys = _rank_to_phys(bank_p)
    for r in range(int(bank_c.count)):
        p = phys[r]
        np.testing.assert_array_equal(np.asarray(bank_p.k[:, p]),
                                      np.asarray(bank_c.k[:, r]),
                                      err_msg=f"k rank {r}")
        np.testing.assert_array_equal(np.asarray(bank_p.v[:, p]),
                                      np.asarray(bank_c.v[:, r]),
                                      err_msg=f"v rank {r}")
        if check_stats:
            np.testing.assert_allclose(float(bank_p.score[p]),
                                       float(bank_c.score[r]), rtol=1e-5,
                                       err_msg=f"score rank {r}")
            assert bool(bank_p.scored[p]) == bool(bank_c.scored[r]), r
            assert int(bank_p.times[p]) == int(bank_c.times[r]), r


def test_inplace_update_matches_compaction_scored():
    """update_bank_inplace == bank_append + evict_if_full (scored path),
    with record mass permuted into each bank's physical layout."""
    from rmem_tpu.memory import update_bank_inplace

    rng = np.random.RandomState(6)
    bank_c = init_bank(L, CAP, B, HW, CK, CV)
    bank_p = init_bank(L, CAP, B, HW, CK, CV)

    for f in range(14):
        k, v = _new_slot(rng)
        kj, vj = jnp.asarray(k), jnp.asarray(v)
        # logical (rank-space) record + fg, shared by both flows
        n_old = int(bank_c.count)
        rec_rank = rng.rand(B, HW, CAP).astype(np.float32)
        rec_rank[..., n_old:] = 777.0   # garbage beyond valid slots
        fg = jnp.asarray(rng.rand(B, HW).astype(np.float32))

        # interleave a no-op frame: must not change logical content
        noop = update_bank_inplace(
            bank_p, kj, vj, jnp.asarray(False), FORMER, LATTER,
            jnp.asarray(rec_rank[..., np.asarray(bank_p.order)]), fg, True)
        _assert_logical_equal(noop, bank_c)
        bank_p = noop

        # memory-write event
        rec_p = rec_rank[..., np.asarray(bank_p.order)]  # rank -> physical
        bank_p = update_bank_inplace(
            bank_p, kj, vj, jnp.asarray(True), FORMER, LATTER,
            jnp.asarray(rec_p), fg, True)
        bank_c = bank_append(bank_c, kj, vj)
        bank_c = evict_if_full(bank_c, FORMER, LATTER,
                               record_mass=jnp.asarray(rec_rank),
                               fg_prob=fg, use_attn_weight=True)
        _assert_logical_equal(bank_p, bank_c)
        # order stays a permutation; spare slot never becomes valid
        assert sorted(np.asarray(bank_p.order).tolist()) == list(range(CAP))
        assert int(bank_p.count) <= FORMER + LATTER


def test_inplace_update_matches_compaction_fifo():
    from rmem_tpu.memory import update_bank_inplace

    rng = np.random.RandomState(7)
    bank_c = init_bank(L, CAP, B, HW, CK, CV)
    bank_p = init_bank(L, CAP, B, HW, CK, CV)
    for f in range(10):
        k, v = _new_slot(rng)
        kj, vj = jnp.asarray(k), jnp.asarray(v)
        bank_p = update_bank_inplace(bank_p, kj, vj, jnp.asarray(True),
                                     FORMER, LATTER, use_attn_weight=False)
        bank_c = bank_append(bank_c, kj, vj)
        bank_c = evict_if_full(bank_c, FORMER, LATTER,
                               use_attn_weight=False)
        _assert_logical_equal(bank_p, bank_c, check_stats=False)


def test_inplace_update_jittable():
    from rmem_tpu.memory import update_bank_inplace

    rng = np.random.RandomState(8)
    bank = init_bank(L, CAP, B, HW, CK, CV)
    rec = jnp.asarray(rng.rand(B, HW, CAP).astype(np.float32))
    fg = jnp.asarray(rng.rand(B, HW).astype(np.float32))

    @jax.jit
    def step(b, kv, do):
        return update_bank_inplace(b, kv[0], kv[1], do, FORMER, LATTER,
                                   rec, fg, True)

    for f in range(8):
        k, v = _new_slot(rng)
        bank = step(bank, (jnp.asarray(k), jnp.asarray(v)),
                    jnp.asarray(f % 2 == 0))
    assert bank.k.shape == (L, CAP, B, HW, CK)
    assert int(bank.count) == FORMER + LATTER


def test_eviction_jittable_and_static_shape():
    rng = np.random.RandomState(5)
    bank = init_bank(L, CAP, B, HW, CK, CV)
    for _ in range(CAP):
        k, v = _new_slot(rng)
        bank = bank_append(bank, jnp.asarray(k), jnp.asarray(v))
    rec = jnp.asarray(rng.rand(B, HW, CAP).astype(np.float32))
    fg = jnp.asarray(rng.rand(B, HW).astype(np.float32))
    f = jax.jit(lambda b: evict_if_full(b, FORMER, LATTER, rec, fg, True))
    out = f(bank)
    assert out.k.shape == bank.k.shape
    assert int(out.count) == FORMER + LATTER
