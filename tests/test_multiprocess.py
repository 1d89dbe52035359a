"""REAL multi-process runtime test (VERDICT item 2).

Spawns 2 OS processes that initialize jax.distributed against a local
coordinator (CPU backend, gloo collectives, 2 local devices each -> a 4-device
global mesh), runs the production sharded train step in both, and asserts the
loss trajectory and final parameters equal the single-process 4-device run of
the identical program.  This executes the SPMD data-disjointness contract of
danerf_tpu/parallel/mesh.py (module docstring) as running code: every process
computes the same global program; GSPMD gives each its disjoint ray shard and
the gradient all-reduce crosses the process boundary through real collectives.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "proc0.json"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, WORKER, str(i), "2",
                               str(port), str(out)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for i in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed:\n{se.decode(errors='replace')[-2000:]}")
    with open(out) as f:
        multi = json.load(f)
    assert multi["process_count"] == 2
    assert multi["device_count"] == 4

    # identical program, single process, 4 local devices (conftest fakes 8)
    from tests.mp_worker import run_steps
    import jax

    losses, state = run_steps(4)
    checksum = float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree_util.tree_leaves(state.params)))

    np.testing.assert_allclose(multi["losses"], losses, rtol=1e-5,
                               err_msg="multi-process loss trajectory diverged"
                                       " from the single-process run")
    np.testing.assert_allclose(multi["param_checksum"], checksum, rtol=1e-5)
