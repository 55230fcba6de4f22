"""Multi-host bring-up test: REAL multi-process collectives on CPU.

Spawns two OS processes, each with 4 virtual CPU devices, initializes
``jax.distributed`` against a local coordinator, and runs cross-process
psums over the global 8-device (data=2, tiles=4) mesh — the same mesh
shape the sharded train step uses.  This validates the
``gscream_tpu.parallel.distributed`` wiring end-to-end without TPU pods
(SURVEY.md §7 step 7; the reference has no distributed path at all).
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys, os
sys.path.insert(0, os.environ["GSC_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from gscream_tpu.parallel.distributed import init_distributed, process_info
from gscream_tpu.parallel.mesh import make_mesh, DATA_AXIS, TILE_AXIS

ok = init_distributed(os.environ["GSC_COORD"], 2,
                      int(os.environ["GSC_PID"]))
assert ok
pi, pc, nloc, nglob = process_info()
assert pc == 2 and nloc == 4 and nglob == 8, (pi, pc, nloc, nglob)

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

mesh = make_mesh(data=2, tiles=4)

def local_fn(x):
    d = jax.lax.axis_index(DATA_AXIS)
    t = jax.lax.axis_index(TILE_AXIS)
    own = x * 0 + (d * 4 + t).astype(jnp.float32)
    s = jax.lax.psum(own, DATA_AXIS)          # across processes
    s = jax.lax.psum(s, TILE_AXIS)            # within process
    return s

f = jax.jit(shard_map(local_fn, mesh=mesh, in_specs=P(), out_specs=P(),
                      check_vma=False))
out = f(jnp.zeros((8,), jnp.float32))
val = float(out[0])
assert val == 28.0, val                       # sum of device ids 0..7
print(f"proc {pi}: global psum OK ({val})", flush=True)
"""


@pytest.mark.timeout(300)
def test_two_process_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "GSC_REPO": repo,
            "GSC_COORD": coord,
            "GSC_PID": str(pid),
            "XLA_FLAGS": (env.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=4"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "global psum OK (28.0)" in out, out
