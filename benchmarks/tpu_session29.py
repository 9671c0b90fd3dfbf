"""TPU experiment 29: two-object tracking at the production config.

P7 certification on hardware: K=2 scene (L-shape + box crossing 6 cm in
front of it — tracked mutual occlusion) at 10k particles, 80x60, the
production fused-pallas sensor (union triangle list; per-object
coordinate blocks with per-block KL resampling). Reports per-object
pos RMSE and symmetric-quotient rotation RMSE.

Appends {"two_obj_production": {...}} to eval_tpu.json.
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

if os.environ.get("S29_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu import config as cfg
from dbot_ros_tpu.runtime import node
from dbot_ros_tpu.runtime.sources import OracleSource
from dbot_ros_tpu.trackers.particle import ParticleTracker
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import box_mesh, l_shape_mesh
from dbot_ros_tpu.utils.se3 import box_symmetry_quats

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("S29_OUT", os.path.join(ROOT, "eval_tpu.json"))
P = int(os.environ.get("S29_P", 10_000))
FRAMES = int(os.environ.get("S29_FRAMES", 60))

print("devices:", jax.devices(), flush=True)

cam = default_kinect_camera(8)
mesh_l = l_shape_mesh()
mesh_b = box_mesh(0.05, 0.07, 0.03)
start = jnp.concatenate([jnp.array([0.0, 0.0, 0.55]), se3.quat_identity()])


def traj(t):
    # the eval suite's two_obj protocol at production scale: the L
    # drifts right; the box crosses leftward 6 cm in front of it
    ang = 0.02 * t
    q0 = se3.quat_multiply(se3.so3_exp_quat(jnp.array([0.0, ang, 0.0])),
                           start[3:7])
    p0 = start.at[0].add(0.0015 * t)
    p1 = jnp.array([0.13 - 0.006 * t, 0.01, 0.49])
    q1 = se3.quat_multiply(
        se3.so3_exp_quat(jnp.array([0.015 * t, 0.0, 0.0])), start[3:7])
    return jnp.stack([jnp.concatenate([p0[:3], q0]),
                      jnp.concatenate([p1, q1])])


obs = cfg.ObservationConfig(model_sigma=0.005, sigma_factor=0.0)
trans = cfg.TransitionConfig(linear_acceleration_sigma=0.4,
                             angular_acceleration_sigma=2.5, damping=6.0)
opts = ({"interpret": True, "nb": 16} if os.environ.get("S29_CPU") else {})
conf = cfg.ParticleTrackerConfig(
    observation=obs, transition=trans, evaluation_count=P,
    max_kl_divergence=0.8, backend="pallas", seed=1, backend_options=opts)
tracker = ParticleTracker(conf, meshes=[mesh_l, mesh_b], camera=cam)

t0 = time.time()
src = OracleSource([mesh_l, mesh_b], cam, traj, num_frames=FRAMES,
                   noise_sigma=0.003, seed=3)
run = node.run(tracker, src, initial_pose=np.asarray(traj(0)))
e_rot = run.rotation_errors([None, box_symmetry_quats()])
per_rot = np.sqrt((e_rot ** 2).mean(0))
per_pos = np.sqrt((run.position_errors() ** 2).mean(0))
lat = [m.latency_s for m in run.metrics.records[2:]]
rec = {
    "particles": P, "frames": FRAMES,
    "L_pos_rmse_m": round(float(per_pos[0]), 5),
    "box_pos_rmse_m": round(float(per_pos[1]), 5),
    "L_rot_rmse_rad": round(float(per_rot[0]), 4),
    "box_rot_rmse_sym_rad": round(float(per_rot[1]), 4),
    "median_track_ms": round(1e3 * float(np.median(lat)), 2),
    "wall_s": round(time.time() - t0, 1),
}
results = json.load(open(OUT)) if os.path.exists(OUT) else {}
results["two_obj_production"] = rec
with open(OUT, "w") as fh:
    json.dump(results, fh, indent=1)
print("two_obj_production:", json.dumps(rec), flush=True)
print("DONE", flush=True)
