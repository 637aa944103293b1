"""multihost_gather exercised with REAL multiple JAX processes.

Two `jax.distributed`-initialized CPU subprocesses gather per-worker count
rows and compute the kv-pair metric; the shared fname must be deduplicated
exactly once on every worker (reference: torch all_gather_object + fname
dedup, pipeline/evaluation.py:149-177).
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
sys.path.insert(0, sys.argv[4])
from peneo_tpu.pipeline.evaluation import calculate_kvpe_metric, multihost_gather

assert jax.process_count() == nproc, jax.process_count()
# 3 rows unique to this worker + 1 fname shared across workers (the
# distributed eval sampler can hand the same file to several workers)
rows = [[f"doc{pid}_{i}", 2, 2, 1] for i in range(3)] + [["shared", 4, 4, 3]]
gathered = multihost_gather(rows)
assert len(gathered) == 4 * nproc, len(gathered)

summary, detail = calculate_kvpe_metric(
    [], [], [], gather_fn=lambda _: gathered)
print("RESULT " + json.dumps({
    "pid": pid,
    "n_samples": detail["num_sample_processed"],
    "precision": summary["precision"],
}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_multihost_gather_two_processes():
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(nproc), str(pid),
             REPO],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(nproc)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))

    # 2×3 unique docs + 1 shared fname counted ONCE → 7 samples on every
    # worker; num_correct = 6·1 + 3 = 9 over num_pred = 6·2 + 4 = 16
    for r in results:
        assert r["n_samples"] == 7, r
        assert abs(r["precision"] - 9 / 16) < 1e-9, r
