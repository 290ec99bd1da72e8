"""Multi-HOST execution: 2 local `jax.distributed` processes on the CPU
backend, a ('restarts','mc') mesh spanning both, and the fused
multi-restart SGA solve — asserted equal to the single-process unsharded
solve.

This is the executable version of the reference's distributed design
(`/root/reference/experiments/adaptive_bayesopt.jl:92-97,483-488`:
Distributed.addprocs + SharedArray fan-out). Everything else in the test
suite proves single-process multi-DEVICE GSPMD; this test proves the
multi-PROCESS leg (`parallel/mesh.py::initialize_distributed` +
cross-process gloo collectives), which is the same code path a real
multi-host TPU pod takes over ICI/DCN.
"""

import os
import re
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from rollout_bo_tpu.models import decision_rules as dr
from rollout_bo_tpu.rollout import outer
from rollout_bo_tpu.parallel import multihost_worker as mw


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(devices_per_proc=4):
    env = dict(os.environ)
    env["ROLLOUT_BO_TPU_PLATFORM"] = "cpu"
    # the parent test process forces 8 virtual devices (conftest); each
    # worker must get its own count, so strip any inherited flag first
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={devices_per_proc}")
    return env


def test_two_process_fused_solve_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "p0.npz"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "rollout_bo_tpu.parallel.multihost_worker",
             "--process-id", str(i), "--num-processes", "2",
             "--port", str(port)] + (["--out", str(out)] if i == 0 else []),
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(o)
    for i, (p, o) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{o}"
        assert "processes=2" in o and "global_devices=8" in o, o
        assert f"[p{i}] OK" in o, o

    # single-process unsharded reference on the SAME deterministic problem
    st, tp, xstarts, starts = mw.build_problem()
    prog = outer.make_fused_sga_program(st, tp, dr.EI(), xstarts,
                                        **mw.SOLVE_KW)
    xs_ref, vals_ref = prog(st, tp.rnstream,
                            jnp.asarray(starts, st.X.dtype))

    got = np.load(out)
    np.testing.assert_allclose(got["xs"], np.asarray(xs_ref),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(got["vals"], np.asarray(vals_ref),
                               rtol=1e-6, atol=1e-10)
    # the distributed winner selection picks the same restart
    assert int(got["vals"].argmax()) == int(np.asarray(vals_ref).argmax())
