"""Two-process FULL train-step equivalence test — the actual multi-node
DDP contract (reference `operators/distributed_wrapper.py:28-45`:
rank-spanning DistributedDataParallel, gradients all-reduced across OS
processes).

tests/test_multiprocess.py proves the input feed; this test proves the
whole training semantics on the flagship RRNet trainer (SyncBN + grad
pmean + stage-2 criterion + fused skip-aware Adam): two OS processes x 2
virtual CPU devices on a 4-way mesh vs the SAME computation on a
single-process 4-device mesh.

The test pins model.dtype=float32. Measured while building it: with the
default bfloat16 compute, the two process layouts compile different
fusion orders and every activation carries bf16 epsilon (~4e-3 rel), so
losses differ ~6e-5 rel and pmean'd gradients up to ~1% at IDENTICAL
params — that is bf16 physics, not a collective bug, and it would bury
the signal this test is after. In f32 the same computation is bitwise-
equal on the loss and grads agree to 1 ulp (measured max abs diff
1.2e-7), so a real cross-process semantic error (wrong psum span, local
batch misassembly, per-process BN grouping) cannot hide.

Multi-step params still get an envelope, not elementwise equality: Adam
near init is sign(g)-like, so a 1-ulp gradient association difference
flips the update direction of near-zero-gradient elements (measured max
param drift 8e-4 ~ 3*lr after 3 steps).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
mode, out_path = sys.argv[1], sys.argv[2]
if mode == "single":
    ndev = 4
else:
    proc_id, port = int(sys.argv[3]), sys.argv[4]
    ndev = 2
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
if mode == "dist":
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=proc_id)
assert len(jax.devices()) == 4, jax.devices()

import numpy as np
import jax.numpy as jnp
from rrnet_tpu import config as cfglib
from rrnet_tpu.train import Trainer

cfg = cfglib.PRESETS["rrnet"]()
for k, v in [("train.crop_size", (64, 64)), ("train.max_objects", 16),
             ("model.topk", 32), ("model.stage2_rois", 8),
             ("model.backbone", "tiny_hourglass"),
             ("train.stage2_warmup_steps", 1),
             ("model.dtype", "float32")]:
    cfg = cfglib.set_by_path(cfg, k, v)

def global_batch(seed, b=8, n=16, hw=64):
    rng = np.random.RandomState(seed)
    images = rng.randn(b, hw, hw, 3).astype(np.float32)
    xy = rng.rand(b, n, 2) * (hw - 24)
    wh = rng.rand(b, n, 2) * 16 + 4
    cls = rng.randint(1, 11, (b, n, 1)).astype(np.float32)
    pad = np.ones((b, n, 1), np.float32)
    annos = np.concatenate([xy, wh, pad, cls, pad, pad], -1).astype(np.float32)
    valid = np.ones((b, n), bool)
    valid[:, n // 2:] = rng.rand(b, n - n // 2) > 0.3
    return {"images": images, "annos": annos, "valid": valid}

def local(g):
    if mode == "dist":
        # the loader feeds each process ITS contiguous half of the
        # global batch (rows owned by its addressable devices)
        return {k: v[proc_id * 4:(proc_id + 1) * 4] for k, v in g.items()}
    return g

trainer = Trainer(cfg)
state = trainer.init_state()

# the DDP contract: loss + pmean'd grads at the (identical) init params
loss0, grads0 = trainer.loss_and_grads(
    state, trainer.shard(local(global_batch(seed=0))))
grad_leaves = [np.asarray(x) for x in jax.tree.leaves(grads0)]

totals = []
for step in range(3):
    g = local(global_batch(seed=step))
    state, metrics = trainer.train_step(state, trainer.shard(g))
    totals.append(float(metrics["total"]))

param_leaves = [np.asarray(x) for x in
                jax.tree.leaves({"params": state.params,
                                 "batch_stats": state.batch_stats})]
np.savez(out_path,
         loss0=float(loss0), totals=np.asarray(totals),
         skipped=float(metrics["skipped"]),
         n_grads=len(grad_leaves), n_params=len(param_leaves),
         **{f"g{i}": g for i, g in enumerate(grad_leaves)},
         **{f"p{i}": p for i, p in enumerate(param_leaves)})
print("WORKER_OK", mode)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rrnet_train_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    port = str(_free_port())
    paths = {n: tmp_path / f"{n}.npz" for n in ("d0", "d1", "single")}

    def popen(argv):
        return subprocess.Popen([sys.executable, str(worker)] + argv,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, env=env, cwd=REPO)

    procs = [popen(["dist", str(paths["d0"]), "0", port]),
             popen(["dist", str(paths["d1"]), "1", port]),
             popen(["single", str(paths["single"])])]
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc {i} failed:\n{out.decode()}"
        assert "WORKER_OK" in out.decode()

    ref, d0, d1 = (np.load(paths[n]) for n in ("single", "d0", "d1"))
    assert d0["skipped"] == 0.0 and ref["skipped"] == 0.0

    # DDP contract: loss + all-reduced grads at identical params match
    # to collective-association ulps (measured: loss bitwise, grads
    # <= 1.2e-7 abs)
    np.testing.assert_allclose(d0["loss0"], ref["loss0"], rtol=1e-6)
    n_g = int(ref["n_grads"])
    for i in range(n_g):
        np.testing.assert_allclose(
            d0[f"g{i}"], ref[f"g{i}"], rtol=0, atol=1e-5,
            err_msg=f"pmean'd gradient leaf {i} diverged across processes")

    # training trajectory (Adam sign-flips keep this from being exact;
    # measured drift 7e-5 rel by step 3)
    np.testing.assert_allclose(d0["totals"], ref["totals"], rtol=1e-3)

    # params after 3 steps: bulk at the noise floor, every element
    # inside the Adam sign-flip envelope (measured max 8e-4 ~ 3*lr)
    n_p = int(ref["n_params"])
    diffs = np.concatenate([
        np.abs(d0[f"p{i}"].astype(np.float64) -
               ref[f"p{i}"].astype(np.float64)).ravel() for i in range(n_p)])
    assert np.mean(diffs < 1e-4) > 0.95, float(np.mean(diffs < 1e-4))
    assert np.max(diffs) < 5e-3, float(np.max(diffs))

    # replicated state is bitwise identical across the two OS processes
    for i in range(n_p):
        np.testing.assert_array_equal(d0[f"p{i}"], d1[f"p{i}"])
