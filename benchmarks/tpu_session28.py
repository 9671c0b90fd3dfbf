"""TPU experiment 28: single-chip multi-stream serving (P7, round-robin).

vmap over scenes does NOT lower for the fused kernel on hardware (its
HBM-resident operands — occlusion state, candidate slabs — are memory
space ANY, whose pallas batching requires whole-array blocks with
trivial index maps). Interpret-mode vmap works and stays the CPU test
path; on-chip, multi-stream serving on one chip is ROUND-ROBIN: one
compiled KL step, S independent beliefs stepped in turn (exactly how a
serving host would interleave camera streams). This measures what the
vmap would have: aggregate scene-frames/s with S live streams'
buffers resident (donation ping-pong, cache effects, dispatch overlap).

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
SCENES = [int(x) for x in os.environ.get("S28_S", "1,4,8").split(",")]
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

step = jax.jit(functools.partial(
    rbcpf.rbcpf_step, loglik_fn=sensor, trans_params=tp, dt=1.0 / 30.0,
    max_kl_divergence=1.0), donate_argnums=(0,))

for S in SCENES:
    beliefs = [rbcpf.init_belief(jax.random.PRNGKey(s), ref, P,
                                 cam.num_pixels, sensor=sensor)
               for s in range(S)]
    for s in range(S):
        beliefs[s], info = step(beliefs[s], z_obs)
    jax.block_until_ready(beliefs)

    best = np.inf
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(WSTEPS):
            for s in range(S):           # round-robin over live streams
                beliefs[s], info = step(beliefs[s], z_obs)
        jax.block_until_ready(beliefs)
        best = min(best, (time.perf_counter() - t0) / (WSTEPS * S))
    rec = {"per_step_ms": round(best * 1e3, 3),
           "aggregate_scene_fps": round(1.0 / best, 1),
           "streams_at_30hz": int(1.0 / best // 30),
           "particles_per_scene": P}
    results["serving"][str(S)] = rec
    print(f"S={S}:", json.dumps(rec), flush=True)
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
print("DONE", flush=True)
