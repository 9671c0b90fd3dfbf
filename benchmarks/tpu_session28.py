"""TPU experiment 28: single-chip multi-scene serving throughput (P7).

The production-serving shape: S independent tracking scenes batched on
ONE chip via vmap over the full KL filter step (fused pallas sensor —
the vmap adds a leading grid dimension to the kernel; per-instance VMEM
unchanged). Reports per-scene step latency and aggregate scene-frames/s
as S grows — the single-chip half of the batched-serving scaling story
(the multi-chip half is the 2-D scene mesh, docs/SCALING.md).

Appends {"serving": {S: {...}}} to eval_tpu.json.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax

if os.environ.get("S28_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("S28_OUT", os.path.join(ROOT, "eval_tpu.json"))
P = int(os.environ.get("S28_P", 10_000))
SCENES = [int(x) for x in os.environ.get("S28_S", "1,2,4").split(",")]
WINDOWS = int(os.environ.get("S28_WINDOWS", 3))
WSTEPS = int(os.environ.get("S28_WSTEPS", 30))

print("devices:", jax.devices(), flush=True)

results = json.load(open(OUT)) if os.path.exists(OUT) else {}
results.setdefault("serving", {})

cam = default_kinect_camera(8)
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(model_sigma=0.005)
op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
kw = ({"interpret": True, "nb": 16} if os.environ.get("S28_CPU") else {})
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas", **kw)
ref = jnp.concatenate([jnp.array([0., 0., 0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)

for S in SCENES:
    beliefs = jax.vmap(lambda k: rbcpf.init_belief(
        k, ref, P, cam.num_pixels, sensor=sensor))(
        jax.random.split(jax.random.PRNGKey(0), S))
    zs = jnp.broadcast_to(z_obs, (S, cam.num_pixels))
    step = jax.jit(jax.vmap(functools.partial(
        rbcpf.rbcpf_step, loglik_fn=sensor, trans_params=tp,
        dt=1.0 / 30.0, max_kl_divergence=1.0)), donate_argnums=(0,))
    beliefs, infos = step(beliefs, zs)
    jax.block_until_ready(beliefs)

    best = np.inf
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(WSTEPS):
            beliefs, infos = step(beliefs, zs)
        jax.block_until_ready(beliefs)
        best = min(best, (time.perf_counter() - t0) / WSTEPS)
    rec = {"step_ms": round(best * 1e3, 3),
           "scene_frames_per_s": round(S / best, 1),
           "particles_per_scene": P}
    results["serving"][str(S)] = rec
    print(f"S={S}:", json.dumps(rec), flush=True)
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
print("DONE", flush=True)
