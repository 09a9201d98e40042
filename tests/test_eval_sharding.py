"""Length-aware eval sharding (the static analogue of the reference's
mp.Queue work stealing, aot_plus/networks/managers/evaluator.py:276-295)."""

import numpy as np

from rmem_tpu.parallel.eval_sharding import host_sequence_indices


def _partition(num, pc, lengths=None):
    parts = [host_sequence_indices(num, process_index=h, process_count=pc,
                                   lengths=lengths) for h in range(pc)]
    # every sequence assigned exactly once
    flat = sorted(i for p in parts for i in p)
    assert flat == list(range(num))
    return parts


def test_strided_fallback():
    parts = _partition(10, 4)
    assert parts[0] == [0, 4, 8]
    assert parts[1] == [1, 5, 9]


def test_lpt_balances_4x_skewed_lengths():
    # VOST-like skew: lengths vary 4x. Strided striping can gate every host
    # on the unluckiest slice; LPT keeps per-host frame totals within ~10%.
    rng = np.random.RandomState(0)
    lengths = list(rng.randint(50, 201, size=40))
    pc = 4
    parts = _partition(len(lengths), pc, lengths)
    loads = [sum(lengths[i] for i in p) for p in parts]
    mean = sum(lengths) / pc
    assert max(loads) <= 1.10 * mean, (loads, mean)
    assert min(loads) >= 0.90 * mean, (loads, mean)


def test_lpt_deterministic_across_hosts():
    lengths = [7, 3, 9, 1, 5, 5, 2, 8]
    a = [host_sequence_indices(8, h, 3, lengths) for h in range(3)]
    b = [host_sequence_indices(8, h, 3, lengths) for h in range(3)]
    assert a == b
    # indices returned sorted so downstream iteration order is stable
    for p in a:
        assert p == sorted(p)


def test_lpt_single_host_is_identity():
    assert host_sequence_indices(5, 0, 1, [9, 1, 4, 4, 2]) == [0, 1, 2, 3, 4]


def test_split_bulk_tail_disjoint_covering():
    from rmem_tpu.parallel.eval_sharding import split_bulk_tail
    rng = np.random.RandomState(1)
    lengths = list(rng.randint(50, 201, size=30))
    bulk, tail = split_bulk_tail(30, lengths, 4, tail_frac=0.1)
    seen = sorted(tail + [i for b in bulk for i in b])
    assert seen == list(range(30))
    # tail holds the SHORTEST sequences and <= 10% of total frames
    tail_frames = sum(lengths[i] for i in tail)
    assert tail_frames <= 0.1 * sum(lengths)
    if tail:
        assert max(lengths[i] for i in tail) <= min(
            lengths[i] for b in bulk for i in b)


def test_split_bulk_tail_single_host_all_bulk():
    from rmem_tpu.parallel.eval_sharding import split_bulk_tail
    bulk, tail = split_bulk_tail(5, [9, 1, 4, 4, 2], 1)
    assert tail == []
    assert bulk == [[0, 1, 2, 3, 4]]


def test_claim_next_each_index_claimed_once(tmp_path):
    from rmem_tpu.parallel.eval_sharding import claim_next
    cands = list(range(7))
    got = []
    while True:
        i = claim_next(str(tmp_path), cands, owner="t")
        if i is None:
            break
        got.append(i)
    assert sorted(got) == cands


def test_dynamic_tail_balances_skewed_speeds(tmp_path):
    """VERDICT r3 Next #7 acceptance: per-sequence SPEED variance (cost !=
    frames) skews static LPT; the claimed tail re-balances within 10%."""
    import heapq

    from rmem_tpu.parallel.eval_sharding import (claim_next,
                                                 host_sequence_indices,
                                                 split_bulk_tail)

    rng = np.random.RandomState(9)
    n, pc = 24, 4
    lengths = list(rng.randint(50, 201, size=n))
    # per-frame cost varies 3x (object count / resolution differences the
    # frame-count LPT cannot see)
    cost = [lengths[i] * rng.uniform(1.0, 3.0) for i in range(n)]

    def makespan_static():
        parts = [host_sequence_indices(n, h, pc, lengths) for h in range(pc)]
        return [sum(cost[i] for i in p) for p in parts]

    def makespan_dynamic(claim_dir):
        bulk, tail = split_bulk_tail(n, lengths, pc)
        finish = [sum(cost[i] for i in bulk[h]) for h in range(pc)]
        heap = [(finish[h], h) for h in range(pc)]
        heapq.heapify(heap)
        while heap:
            t, h = heapq.heappop(heap)
            i = claim_next(claim_dir, tail, owner=str(h))
            if i is None:
                finish[h] = t
                continue
            heapq.heappush(heap, (t + cost[i], h))
        return finish

    static = makespan_static()
    dyn = makespan_dynamic(str(tmp_path / "claims"))
    ideal = sum(cost) / pc
    # static LPT-by-frames is visibly skewed on this seed; the dynamic tail
    # pulls the makespan within 10% of the ideal equal split
    assert max(static) > 1.15 * ideal, (max(static), ideal)
    assert max(dyn) <= 1.10 * ideal, (max(dyn), ideal)
    assert max(dyn) < max(static)
