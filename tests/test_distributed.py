"""Multi-host wiring smoke tests: jax.distributed over two CPU processes.

The reference has no distributed machinery at all (SURVEY.md §2.4); this is
the framework's own multi-host promise — ``distributed_init``
(parallel/mesh.py) called by ``train.py`` behind ``--num_processes``.
Here two actual OS processes form a JAX cluster over a localhost
coordinator and all-gather across it.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from harl_tpu.parallel.mesh import distributed_init

distributed_init({coord!r}, 2, int(sys.argv[1]))
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())  # 2 procs x 2 local
import jax.numpy as jnp
from jax.experimental import multihost_utils

x = jnp.ones(()) * (jax.process_index() + 1)
total = float(multihost_utils.process_allgather(x).sum())
print("GLOBAL_SUM", total, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, coord=coord))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
        assert p.returncode == 0, out
    # both processes saw the cross-process all-gather: 1 + 2 = 3
    for out in outs:
        assert "GLOBAL_SUM 3.0" in out, out
