"""Multi-host evaluation sharding.

The reference shards eval over GPUs with an mp.Queue work-stealing loop
(aot_plus/tools/eval.py:137-145, managers/evaluator.py:276-295) and merges
FPS stats through a second queue (evaluator.py:589-613). In single-controller
JAX the equivalent is: each host takes a static strided slice of the sequence
list, runs its local Evaluator, and scalar stats are summed across hosts with
a tiny psum (over DCN for multi-host meshes).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def host_sequence_indices(num_sequences: int,
                          process_index: int | None = None,
                          process_count: int | None = None,
                          lengths: Sequence[int] | None = None) -> List[int]:
    """Partition of sequence indices for this host.

    With `lengths` (per-sequence frame counts, known from the dataset index
    before any work starts), uses greedy longest-processing-time (LPT)
    assignment: sequences sorted by descending length, each placed on the
    currently least-loaded host. This is the static equivalent of the
    reference's dynamic mp.Queue work stealing (evaluator.py:276-295) — VOST
    sequence lengths vary ~4x, so plain striding gates every host on the
    unluckiest slice; LPT is within 4/3 of optimal makespan.

    Without `lengths`, falls back to strided partitioning.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if lengths is None:
        return list(range(pi, num_sequences, pc))
    assert len(lengths) == num_sequences
    loads = [0] * pc
    assign: List[List[int]] = [[] for _ in range(pc)]
    # Stable tie-break on index keeps the assignment deterministic across
    # hosts (all hosts compute the same partition independently).
    order = sorted(range(num_sequences), key=lambda i: (-lengths[i], i))
    for i in order:
        h = min(range(pc), key=lambda j: (loads[j], j))
        loads[h] += lengths[i]
        assign[h].append(i)
    return sorted(assign[pi])


def split_bulk_tail(num_sequences: int, lengths: Sequence[int],
                    process_count: int,
                    tail_frac: float = 0.1) -> tuple[List[List[int]], List[int]]:
    """Split sequences into an LPT-assigned bulk and a dynamically-claimed
    tail (VERDICT r3 Next #7).

    Static LPT balances *frame counts* but not per-sequence speed (object
    count, resolution), so the slowest host can still gate the run. The
    fix mirrors the reference's mp.Queue work stealing
    (evaluator.py:276-295) for the END of the run only: the SHORTEST
    sequences summing to ~`tail_frac` of total frames are held back and
    claimed at runtime by whichever host finishes its bulk first; short
    items keep the claim granularity (and thus the worst-case imbalance)
    small.

    Returns (bulk_assignments[host] -> indices, tail_indices). All hosts
    compute the same split deterministically.
    """
    assert len(lengths) == num_sequences
    total = sum(lengths)
    budget = total * tail_frac
    by_len = sorted(range(num_sequences), key=lambda i: (lengths[i], i))
    tail: List[int] = []
    acc = 0
    for i in by_len:
        if acc + lengths[i] > budget or process_count <= 1:
            break
        tail.append(i)
        acc += lengths[i]
    tail_set = set(tail)
    bulk = [i for i in range(num_sequences) if i not in tail_set]
    loads = [0] * process_count
    assign: List[List[int]] = [[] for _ in range(process_count)]
    order = sorted(bulk, key=lambda i: (-lengths[i], i))
    for i in order:
        h = min(range(process_count), key=lambda j: (loads[j], j))
        loads[h] += lengths[i]
        assign[h].append(i)
    return [sorted(a) for a in assign], sorted(tail)


def claim_next(claim_dir: str, candidates: Sequence[int],
               owner: str = "") -> int | None:
    """Atomically claim the next unclaimed index via O_CREAT|O_EXCL lock
    files in a directory shared by all hosts (TPU pods mount a shared FS;
    this replaces the reference's mp.Queue, which has no multi-host
    equivalent). Returns the claimed index or None when all are taken."""
    import os
    os.makedirs(claim_dir, exist_ok=True)
    for i in candidates:
        path = os.path.join(claim_dir, f"seq_{i:06d}.claim")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            f.write(owner)
        return i
    return None


def allreduce_stats(stats: Dict[str, float]) -> Dict[str, float]:
    """Sum scalar eval stats across hosts (evaluator.py:589-613 equivalent).
    On a single host this is the identity."""
    if jax.process_count() == 1:
        return dict(stats)
    from jax.experimental import multihost_utils
    keys = sorted(stats)
    vec = jnp.asarray([float(stats[k]) for k in keys], jnp.float32)
    summed = multihost_utils.process_allgather(vec).sum(axis=0)
    return {k: float(summed[i]) for i, k in enumerate(keys)}


def maybe_initialize_distributed(coordinator: str | None = None,
                                 num_processes: int | None = None,
                                 process_id: int | None = None):
    """jax.distributed.initialize wrapper for multi-host runs; no-op when
    unconfigured (single-host, the common case here)."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
