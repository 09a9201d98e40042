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
