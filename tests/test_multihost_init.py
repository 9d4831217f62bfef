"""Multi-host bring-up: init_distributed over a real 2-process rendezvous.

The reference does NCCL env:// init (distributed.py:24-31, single node).
Ours is jax.distributed.initialize; this test spawns two actual processes on
CPU, has each join the coordinator, and checks process_count/process_index
and a cross-process psum — the mechanism multi-host training stands on.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, @REPO@)
from facevae_tpu.parallel import init_distributed, is_master

pid = int(sys.argv[1])
init_distributed(coordinator=@COORD@, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert is_master() == (pid == 0)

# one global psum across both processes' devices (4 total)
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
import numpy as np
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
f = jax.jit(shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P()))
x = jnp.ones((4,), jnp.float32)
total = f(x)
assert float(total.addressable_data(0)[0]) == 4.0, total
print("proc %d ok" % pid, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rendezvous(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@REPO@", repr(repo))
                      .replace("@COORD@", repr(coord)))

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out
