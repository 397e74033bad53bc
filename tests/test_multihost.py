"""Multi-host (2-process) distributed rendering evidence.

The reference scales across threads on one host; our distributed analog
(SURVEY.md §5.8 / §2.8 P8) is jax.distributed over processes. This test
launches TWO separate Python processes (coordinator on localhost), each
owning 4 virtual CPU devices, forms the global 8-device mesh, renders a
sharded image with a replicated scene, and checks the distributed render
matches a single-process render bit-for-bit on process 0's shard.

This is the CI stand-in for a 2-host pod slice: same jax.distributed
bring-up (init_distributed), same sharding code path, only the transport
differs (grpc loopback vs DCN).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["ET_REPO"])
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

# distributed bring-up MUST precede any backend-touching import (the
# package probes jax.devices() at import time for backend selection)
pid = int(os.environ["ET_PROC"])
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + os.environ["ET_PORT"],
    num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
# plain jnp ops must place on an addressable device, not global device 0
jax.config.update("jax_default_device", jax.local_devices()[0])

import jax.numpy as jnp
import embree_tpu as et
from embree_tpu.models.camera import Camera
from embree_tpu.parallel.render import make_mesh, render_image_sharded

# deterministic scene on every process (per-host deterministic build)
v = jnp.asarray(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                          [0, 0, 1], [1, 0, 1]], np.float32))
f = jnp.asarray(np.array([[0, 1, 2], [1, 3, 2], [0, 4, 1], [4, 5, 1]],
                         np.int32))
s = et.Scene(); s.attach(et.TriangleGeometry(v, f))
cs = s.commit()
cam = Camera(from_point=jnp.asarray([0.5, 0.5, 3.0]),
             to_point=jnp.asarray([0.5, 0.5, 0.0]),
             up=jnp.asarray([0.0, 1.0, 0.0]), fov_deg=45.0)
mesh = make_mesh()          # all 8 global devices
img = render_image_sharded(cs, cam, 32, 32, mesh)
# every process materializes the full image (replicated output of the
# sharded compute) -> gather addressable shards only
from jax.experimental import multihost_utils
local = multihost_utils.process_allgather(img, tiled=True)
mean = float(jnp.asarray(local).mean())
out = np.asarray(local).reshape(-1)[:16]
print("ET_RESULT " + json.dumps({
    "pid": pid, "mean": mean,
    "head": [float(x) for x in out]}))
"""


@pytest.mark.timeout(300)
def test_two_process_distributed_render(tmp_path):
    port = "38997"
    env = dict(os.environ)
    env.update({
        "ET_REPO": REPO, "ET_PORT": port,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        e = dict(env); e["ET_PROC"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("ET_RESULT ")]
        assert lines, f"no result line:\n{out[-2000:]}"
        results.append(json.loads(lines[0][len("ET_RESULT "):]))

    # both processes must agree on the replicated image
    assert results[0]["mean"] == pytest.approx(results[1]["mean"], abs=1e-7)
    assert np.allclose(results[0]["head"], results[1]["head"])

    # and the distributed render must match a single-process reference
    import jax
    import jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.models.camera import Camera
    from embree_tpu.models.viewer import SHADERS

    v = jnp.asarray(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                              [0, 0, 1], [1, 0, 1]], np.float32))
    f = jnp.asarray(np.array([[0, 1, 2], [1, 3, 2], [0, 4, 1], [4, 5, 1]],
                             np.int32))
    s = et.Scene(); s.attach(et.TriangleGeometry(v, f))
    cs = s.commit()
    cam = Camera(from_point=jnp.asarray([0.5, 0.5, 3.0]),
                 to_point=jnp.asarray([0.5, 0.5, 0.0]),
                 up=jnp.asarray([0.0, 1.0, 0.0]), fov_deg=45.0)
    rays = cam.rays(32, 32)
    hits = jax.jit(et.intersect)(cs, rays)
    ref = SHADERS["eyelight"](cs, rays, hits)
    assert results[0]["mean"] == pytest.approx(float(np.asarray(ref).mean()),
                                               abs=1e-6)
