"""Two-process CPU integration test for the multi-host input feed.

The reference supports multi-node DDP (operators/distributed_wrapper.py:
28-45: rank*ngpus+gpu, tcp rendezvous, NCCL). Our equivalent is
`jax.distributed.initialize` + `parallel.mesh.shard_batch`, which must
assemble each process's LOCAL batch into the global jax.Array (r2
verdict: a device_put with a global-mesh sharding misreads the local
array as the global one). This test runs it for real: two OS processes,
two virtual CPU devices each, a 4-way data mesh spanning both.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from rrnet_tpu.parallel.mesh import create_mesh, replicate, shard_batch

mesh = create_mesh()
assert mesh.devices.shape == (4, 1), mesh.devices.shape

# Each process feeds ITS contiguous half of the global batch (the
# loader shards names by process_index the same way).
gbatch = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 1.0
local = gbatch[proc_id * 2:(proc_id + 1) * 2]
arr = shard_batch({"x": local}, mesh)["x"]
assert arr.shape == (4, 3), arr.shape

# A jitted global reduction must see the whole batch, not 2x the local
# half; the output is replicated so every process can fetch it.
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
np.testing.assert_allclose(float(total), gbatch.sum(), rtol=1e-6)

# Per-shard content check: this process's addressable shards must hold
# exactly its local rows.
for shard in arr.addressable_shards:
    row = shard.index[0].start
    np.testing.assert_array_equal(np.asarray(shard.data)[0], gbatch[row])

# replicate() must produce a fully-replicated global array.
rep = replicate({"w": np.float32(proc_id + 7)}, mesh)["w"]
# deterministic init => both processes pass the same value (7+pid would
# differ; use the shared part only): check shape/sharding round-trips
out = jax.jit(lambda w, x: x * 0 + w)(
    replicate({"w": np.float32(3.5)}, mesh)["w"], arr)
np.testing.assert_allclose(
    np.asarray(out.addressable_shards[0].data), 3.5)
print("WORKER_OK", proc_id)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_batch(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # subprocesses must not inherit the parent's single-process XLA_FLAGS
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
