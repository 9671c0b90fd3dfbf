"""TPU experiment 30: the Gaussian tracker certified on hardware.

EVAL_TPU so far certifies only the particle tracker; this runs the
robust multi-sensor GF (D20/F5, with the round-4 temporal occlusion
memory) at the production frame size (80x60 Kinect intrinsics) through
the nominal and occluder protocols on the chip, and reports closed-loop
RMSE + per-frame step latency.

Appends {"rgf_production": {...}} to eval_tpu.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax

if os.environ.get("S30_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu import config as cfg
from dbot_ros_tpu.runtime import node
from dbot_ros_tpu.runtime.sources import OracleSource
from dbot_ros_tpu.trackers.gaussian import GaussianTracker
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import box_mesh, l_shape_mesh

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("S30_OUT", os.path.join(ROOT, "eval_tpu.json"))
FRAMES = int(os.environ.get("S30_FRAMES", 60))

print("devices:", jax.devices(), flush=True)

cam = default_kinect_camera(8)
mesh = l_shape_mesh()
occluder = box_mesh(0.03, 0.30, 0.02)
start = jnp.concatenate([jnp.array([0.0, 0.0, 0.55]), se3.quat_identity()])


def traj(t):
    ang = 0.03 * t
    q = se3.so3_exp_quat(jnp.array([0.0, ang, 0.0]))
    p = start.at[0].add(0.0015 * t).at[1].add(0.02 * np.sin(0.08 * t))
    return jnp.concatenate([p[:3], se3.quat_multiply(q, start[3:7])])[None]


def occ_fn(t):
    x = -0.14 + 0.009 * max(0, t - 8)
    return np.array([x, 0.0, 0.45, 1, 0, 0, 0], np.float32)


obs = cfg.ObservationConfig(model_sigma=0.005, sigma_factor=0.0)
trans = cfg.TransitionConfig(linear_acceleration_sigma=0.4,
                             angular_acceleration_sigma=2.5, damping=6.0)
conf = cfg.GaussianTrackerConfig(observation=obs, transition=trans,
                                 update_iterations=6, trust_sigma=1.5)
tracker = GaussianTracker(conf, meshes=[mesh], camera=cam)

results = json.load(open(OUT)) if os.path.exists(OUT) else {}
results.setdefault("rgf_production", {})
for kind in ("nominal", "occluder"):
    kw = (dict(occluder=occluder, occluder_fn=occ_fn)
          if kind == "occluder" else {})
    t0 = time.time()
    src = OracleSource(mesh, cam, traj, num_frames=FRAMES,
                       noise_sigma=0.003, seed=3, **kw)
    run = node.run(tracker, src, initial_pose=np.asarray(traj(0)))
    lat = [m.latency_s for m in run.metrics.records[2:]]
    rec = {"pos_rmse_m": round(run.position_rmse(), 5),
           "rot_rmse_rad": round(run.rotation_rmse(), 4),
           "pos_max_m": round(float(
               run.position_errors()[FRAMES // 3:].max()), 5),
           "median_track_ms": round(1e3 * float(np.median(lat)), 2),
           "wall_s": round(time.time() - t0, 1)}
    results["rgf_production"][kind] = rec
    print(f"rgf {kind}:", json.dumps(rec), flush=True)
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
print("DONE", flush=True)
