"""Multi-process (multi-host) data-parallel training (SURVEY.md §5.8).

The reference is single-GPU (main.py:10); §5.8 of the survey specifies
the TPU-native replacement's multi-slice path: jax.distributed, a
process-major mesh with the data axis spanning processes (DCN outer
axis), and host-local batch feeding via
jax.make_array_from_process_local_data.  Real multi-host TPU hardware
is unavailable here, so this launches REAL separate processes on the
CPU platform (4 virtual devices each, gloo cross-process collectives)
and checks the sharded train step reproduces the single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "mp_worker.py")


def _run_worker(pid, nprocs, port, outfile):
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="")
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nprocs), str(port), outfile],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_matches_single(tmp_path):
    port = _free_port()
    out_mp = str(tmp_path / "mp.json")
    out_sp = str(tmp_path / "sp.json")

    procs = [_run_worker(i, 2, port, out_mp) for i in range(2)]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    sp = _run_worker(0, 1, port, out_sp)
    log = sp.communicate(timeout=900)[0].decode()
    assert sp.returncode == 0, log[-3000:]

    mp_res = json.load(open(out_mp))
    sp_res = json.load(open(out_sp))
    assert mp_res["process_count"] == 2
    # same global batch, same seeds: the 2-process sharded step must
    # reproduce the plain single-process step
    np.testing.assert_allclose(mp_res["losses"], sp_res["losses"],
                               rtol=2e-4)
    # and training actually progresses
    assert sp_res["losses"][-1] < sp_res["losses"][0]
