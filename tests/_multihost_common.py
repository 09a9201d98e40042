"""Shared launcher for the 2-process jax.distributed CPU tests."""

import os
import socket
import subprocess
import sys


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_pair(tmp_path, worker_name, extra=(), attempts=3, timeout=1200):
    """Launch two worker processes (pid 0/1) and retry gloo's fixed-30s
    rendezvous deadline misses (a machine-load flake on this 1-core host,
    not a code bug); any other failure raises immediately."""
    worker = os.path.join(os.path.dirname(__file__), worker_name)
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
        port = free_port()
        procs = [subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(tmp_path),
             *extra],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for pid in range(2)]
        outs = [p.communicate(timeout=timeout) for p in procs]
        full_errs = [se.decode() for _, se in outs]
        if (attempt + 1 < attempts
                and any(p.returncode != 0 for p in procs)
                and all("DEADLINE_EXCEEDED" in e or p.returncode == 0
                        for p, e in zip(procs, full_errs))):
            continue
        for p, e in zip(procs, full_errs):
            assert p.returncode == 0, e[-3000:]
        break
