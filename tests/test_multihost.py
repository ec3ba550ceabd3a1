"""Multi-host (multi-process) smoke: `parallel.initialize_distributed`
brings up the JAX distributed runtime over loopback DCN, the global mesh
spans both processes' devices, and a psum crosses the process boundary —
the TPU-pod analog of the reference's
`dist.init_process_group(backend="nccl", tcp://127.0.0.1:23456)` DDP
bring-up (`examples/multigpu_ddp.py:75-125`)."""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
import numpy as np
import pytest

# compile-heavy: excluded from the fast subset
pytestmark = pytest.mark.slow

import jax
from jax.sharding import PartitionSpec as P
import mink_octtree_stablediffusion_tpu as mt

mt.parallel.initialize_distributed(
    coordinator_address=os.environ["COORD"],
    num_processes=2, process_id=int(os.environ["PID"]))
assert jax.process_count() == 2, jax.process_count()
mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("data",))

def f(x):
    return jax.lax.psum(jnp_sum(x), "data")

import jax.numpy as jnp
def jnp_sum(x):
    return jnp.sum(x)

step = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(P("data"),),
                             out_specs=P()))
n = len(jax.devices())
with mesh:
    x = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, P("data")),
        np.arange(len(jax.local_devices()), dtype=np.float32) +
        10.0 * jax.process_index())
out = step(x)
# sum over process 0 rows (0, 1) and process 1 rows (10, 11) = 22
expect = sum(range(len(jax.local_devices()))) * jax.process_count() + \
    10.0 * len(jax.local_devices()) * sum(range(jax.process_count()))
val = float(out)  # replicated output: readable on every process
assert abs(val - expect) < 1e-6, (val, expect)
print(f"proc {jax.process_index()} psum={val} OK", flush=True)
"""


def test_two_process_psum_over_dcn():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update({
        "REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COORD": f"127.0.0.1:{port}",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    })
    # site hooks that eagerly initialize a backend (e.g. a TPU tunnel
    # plugin) break `jax.distributed.initialize`; the workers are CPU-only
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    procs = []
    for pid in (0, 1):
        e = dict(env, PID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert any("psum=" in o and "OK" in o for o in outs)
