"""Multi-host runtime test: 2 processes x 4 CPU devices joined by
jax.distributed, running the observation-sharded distributed-BA step across
the PROCESS boundary (SURVEY.md §2.4 "distributed BA over multi-host slice";
BASELINE config 5).  The parent computes the same step on its own 8-device
single-process mesh and requires numerical agreement."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestMultiHost:
    def test_two_process_distributed_ba(self, tmp_path):
        port = _free_port()
        env = dict(os.environ)
        # clean JAX env: no axon sitecustomize, plain CPU with 4 local devices
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.pop("JAX_NUM_CPU_DEVICES", None)
        child = os.path.join(REPO, "tests", "multihost_child.py")
        procs = [
            subprocess.Popen(
                [sys.executable, child, str(i), "2", str(port), str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
        for i, p in enumerate(procs):
            assert p.returncode == 0, f"proc {i} failed:\n{outs[i][-3000:]}"

        r0 = np.load(tmp_path / "result_0.npz")
        r1 = np.load(tmp_path / "result_1.npz")
        # both processes materialize the SAME replicated result
        np.testing.assert_allclose(r0["poses"], r1["poses"], atol=1e-6)
        np.testing.assert_allclose(r0["pts"], r1["pts"], atol=1e-6)
        assert np.isfinite(r0["poses"]).all() and np.isfinite(r0["pts"]).all()

        # single-process reference on the parent's 8-device mesh
        from tests.multihost_child import make_problem_np, run_distributed
        from asdslam_tpu.parallel import dist

        mesh = dist.make_mesh(8)
        poses_ref, pts_ref = run_distributed(mesh, make_problem_np(n_dev=8))
        # f32 psum ordering differs across process topologies: loose atol
        np.testing.assert_allclose(r0["poses"], np.asarray(poses_ref), atol=5e-3)
        np.testing.assert_allclose(r0["pts"], np.asarray(pts_ref), atol=2e-2)
