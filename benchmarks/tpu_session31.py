"""TPU experiment 31: GF device-step latency, chained (production size).

The reference's Gaussian-tracker headline is "real-time >= 30 Hz on a
single CPU core" (Issac ICRA-2016). Certify the TPU-native RGF's
chained step latency at the production frame size (80x60, 6 iterated
updates, occlusion memory on) — the timing methodology of bench.py
(min over windows, full-belief blocking; tunnel RTT excluded by
chaining).

Appends {"rgf_step_ms": ...} to eval_tpu.json.
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

if os.environ.get("S31_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu import config as cfg
from dbot_ros_tpu.filters import rgf
from dbot_ros_tpu.models import beam as bm
from dbot_ros_tpu.models import occlusion as om
from dbot_ros_tpu.models import transition
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import l_shape_mesh

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("S31_OUT", os.path.join(ROOT, "eval_tpu.json"))
WINDOWS = int(os.environ.get("S31_WINDOWS", 3))
WSTEPS = int(os.environ.get("S31_WSTEPS", 30))

print("devices:", jax.devices(), flush=True)

cam = default_kinect_camera(8)
mesh = l_shape_mesh()
bp = bm.make_beam_params(model_sigma=0.005, sigma_factor=0.0)
op = om.make_occlusion_params()
tp = transition.make_transition_params(0.4, 2.5, damping=6.0)
pose = jnp.concatenate([jnp.array([0.0, 0.0, 0.55]), se3.quat_identity()])
d = raycast_depth(mesh, pose, cam.rays, 128)
z = jnp.where(jnp.isfinite(d), d, 2.0)


def render_fn(poses):
    return raycast_depth(mesh, poses, cam.rays)


step = jax.jit(functools.partial(
    rgf.rgf_step, render_fn=render_fn, trans_params=tp, dt=1.0 / 30.0,
    bp=bp, iterations=6, trust_sigma=1.5, occ_params=op),
    donate_argnums=(0,))

belief = rgf.init_belief(jax.random.PRNGKey(0), pose,
                         num_pixels=cam.num_pixels, first_frame=z,
                         initial_occlusion_prob=0.1)
belief, info = step(belief, z)
jax.block_until_ready((belief, info))

best = np.inf
for _ in range(WINDOWS):
    t0 = time.perf_counter()
    for _ in range(WSTEPS):
        belief, info = step(belief, z)
    jax.block_until_ready((belief, info))
    best = min(best, (time.perf_counter() - t0) / WSTEPS)
ms = best * 1e3
results = json.load(open(OUT)) if os.path.exists(OUT) else {}
results["rgf_step_ms"] = {"ms": round(ms, 3),
                          "hz": round(1e3 / ms, 1),
                          "config": "80x60, 6 iterations, occ memory"}
with open(OUT, "w") as fh:
    json.dump(results, fh, indent=1)
print("rgf_step:", json.dumps(results["rgf_step_ms"]), flush=True)
print("DONE", flush=True)
