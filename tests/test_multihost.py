"""2-process jax.distributed rendering over localhost DCN (VERDICT r3
task 7): the exercised analog of `mitsuba -c host1;host2` + mtssrv
(sched_remote.h:50-197). Spawns two worker processes, each with 4
virtual CPU devices, forming one 8-device mesh; both must complete the
sharded sppm pass and agree on the image mean."""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_render():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # workers set their own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, str(pid), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=ROOT) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
    means = [float(o.split("MULTIHOST_OK")[1].split()[0]) for o in outs]
    assert abs(means[0] - means[1]) < 1e-6, means
