"""Failure-recovery drills (SURVEY.md section 5 aux subsystems).

1. Kill/resume: a --ckpt-dir z-score sweep through the PRODUCT CLI is
   SIGKILLed mid-sweep and resumed; the resumed run must produce output
   byte-identical to an uninterrupted run (chunk files survive the kill,
   the fingerprint accepts them, finished chunks are not recomputed).
2. Two-process jax.distributed bring-up: parallel.init_distributed() on a
   real 2-process CPU cluster; the scenario mesh must span both processes
   and a psum collective must reduce across them.
"""

import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

SEQ_A = ">a\nGCGCUUGCGUUAAGCAAGCGC\n"
SEQ_B = ">b\nGCGCUUGCAAGCGC\n"


def _cli_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR", None)
    env["PYTHONPATH"] = str(ROOT)
    return env


def _zscore_cmd(a, b, ckpt):
    return [sys.executable, "-m", "ractip_tpu.cli", str(a), str(b),
            "--zscore=12", "--num-shuffling=12", "--chunk=1", "--seed=7",
            "--no-mesh", f"--ckpt-dir={ckpt}"]


@pytest.mark.slow
def test_kill_resume_zscore_sweep(tmp_path):
    a, b = tmp_path / "a.fa", tmp_path / "b.fa"
    a.write_text(SEQ_A)
    b.write_text(SEQ_B)
    ck = tmp_path / "ck"
    ck2 = tmp_path / "ck_clean"
    env = _cli_env()

    # start the sweep, SIGKILL it once >=1 chunk has been persisted
    p = subprocess.Popen(_zscore_cmd(a, b, ck), env=env,
                        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                        cwd=ROOT)
    deadline = time.time() + 900
    killed = False
    while time.time() < deadline:
        if p.poll() is not None:
            break
        done = list(ck.glob("chunk_*.npz"))
        if len(done) >= 1:
            p.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.05)
    p.wait(timeout=60)
    assert killed, "sweep finished before any chunk landed (or never started)"
    n_done = len(list(ck.glob("chunk_*.npz")))
    assert 1 <= n_done < 13, f"{n_done} chunks at kill time"

    # resume: must complete and reuse the stored chunks
    r = subprocess.run(_zscore_cmd(a, b, ck), env=env, cwd=ROOT,
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    # 12 decoys at chunk=1 -> 12 sweep chunks (the real-pair run is separate
    # and not checkpointed)
    assert len(list(ck.glob("chunk_*.npz"))) == 12

    # uninterrupted reference run: byte-identical stdout
    r2 = subprocess.run(_zscore_cmd(a, b, ck2), env=env, cwd=ROOT,
                        capture_output=True, text=True, timeout=1800)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert r.stdout == r2.stdout


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
coord, pid = sys.argv[1], int(sys.argv[2])
from ractip_tpu.parallel import init_distributed, scenario_mesh
from ractip_tpu.parallel.mesh import SCENARIO_AXES, sharded_mean_var
assert init_distributed(coordinator=coord, num_processes=2, process_id=pid)
import jax
import jax.numpy as jnp
import numpy as np
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 4, jax.device_count()
mesh = scenario_mesh()
assert mesh.devices.size == 4
# global psum across BOTH processes through the production reduction
from jax.sharding import NamedSharding, PartitionSpec as P
x_local = np.arange(2, dtype=np.float32) + 2 * pid   # global [0,1,2,3]
xg = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(SCENARIO_AXES)), x_local, (4,))
vg = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(SCENARIO_AXES)), np.ones(2, np.float32), (4,))
m, v = sharded_mean_var(xg, mesh, vg)
np.testing.assert_allclose(float(m), 1.5, atol=1e-6)
np.testing.assert_allclose(float(v), 1.25, atol=1e-6)
print("OK", pid)
"""


@pytest.mark.slow
def test_two_process_distributed_cpu(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    w = tmp_path / "worker.py"
    w.write_text(_WORKER)
    env = _cli_env()
    procs = [subprocess.Popen([sys.executable, str(w), coord, str(i)],
                              env=env, cwd=ROOT, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc {i}: {err[-3000:]}"
        assert f"OK {i}" in out
