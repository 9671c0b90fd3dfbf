"""TPU experiment 27: two_obj particle-budget diagnosis + fixed-config leg.

A. two_obj box-rotation error vs particle budget (VERDICT r3 item 5
   second half): the box's symmetric-quotient rot RMSE at 512 particles
   is 0.265 rad while the SAME box alone tracks at 0.062 — is the
   degradation joint-lineage particle starvation (more particles fix
   it) or a real mutual-occlusion observability limit? Sweep P on the
   eval scene (xla backend — small 40x30 frames, quick compiles).

B. Fixed-parameter operation at the production operating point: one
   config (angular sigma 6.0) at 10k particles / 80x60 / production
   pallas defaults on BOTH nominal and fast_rot (the CPU probe showed
   single-config tracking at 512; certify it on-chip at 10k).

Appends results to eval_tpu.json under "two_obj_budget" / "fixed_config".
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

if os.environ.get("S27_CPU"):
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
OUT = os.environ.get("S27_OUT", os.path.join(ROOT, "eval_tpu.json"))

print("devices:", jax.devices(), flush=True)

results = json.load(open(OUT)) if os.path.exists(OUT) else {}
results.setdefault("two_obj_budget", {})
results.setdefault("fixed_config", {})


def flush():
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)


# --------------------------------------------------------------- leg A
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
from eval_suite import build_scene, make_source, make_tracker  # noqa: E402

cam_a, mesh_a, occluder_a = build_scene()
budgets = [int(x) for x in os.environ.get(
    "S27_BUDGETS", "512,2048,8192").split(",")]
frames_a = int(os.environ.get("S27_FRAMES", 45))
for P in budgets:
    t0 = time.time()
    tracker = make_tracker("pf-xla", cam_a, mesh_a, P, "two_obj")
    run = node.run(tracker, make_source("two_obj", cam_a, mesh_a,
                                        occluder_a, frames_a))
    e = run.rotation_errors([None, box_symmetry_quats()])
    per = np.sqrt((e ** 2).mean(0))
    pos = np.sqrt((run.position_errors() ** 2).mean(0))
    rec = {"L_rot": round(float(per[0]), 4),
           "box_rot_sym": round(float(per[1]), 4),
           "L_pos": round(float(pos[0]), 5),
           "box_pos": round(float(pos[1]), 5),
           "wall_s": round(time.time() - t0, 1)}
    results["two_obj_budget"][str(P)] = rec
    print(f"two_obj P={P}:", json.dumps(rec), flush=True)
    flush()


# --------------------------------------------------------------- leg B
P = int(os.environ.get("S27_P", 10_000))
FRAMES = int(os.environ.get("S27_FRAMES_B", 60))
cam = default_kinect_camera(8)
mesh = l_shape_mesh()
start = jnp.concatenate([jnp.array([0.0, 0.0, 0.55]), se3.quat_identity()])


def traj_nominal(t):
    ang = 0.03 * t
    q = se3.so3_exp_quat(jnp.array([0.0, ang, 0.0]))
    p = start.at[0].add(0.0015 * t).at[1].add(0.02 * np.sin(0.08 * t))
    return jnp.concatenate([p[:3], se3.quat_multiply(q, start[3:7])])[None]


def traj_fast_rot(t):
    ang = 0.145 * t
    axis = jnp.array([0.5, 0.8, 0.33])
    axis = axis / jnp.linalg.norm(axis)
    q = se3.so3_exp_quat(axis * ang)
    p = start.at[0].add(0.001 * t)
    return jnp.concatenate([p[:3], se3.quat_multiply(q, start[3:7])])[None]


obs = cfg.ObservationConfig(model_sigma=0.005, sigma_factor=0.0)
trans = cfg.TransitionConfig(linear_acceleration_sigma=0.4,
                             angular_acceleration_sigma=6.0, damping=6.0)
opts = ({"interpret": True, "nb": 16} if os.environ.get("S27_CPU") else {})
conf = cfg.ParticleTrackerConfig(
    observation=obs, transition=trans, evaluation_count=P,
    max_kl_divergence=0.8, backend="pallas", seed=1, backend_options=opts)
tracker = ParticleTracker(conf, meshes=[mesh], camera=cam)

for kind, traj in (("nominal", traj_nominal), ("fast_rot", traj_fast_rot)):
    t0 = time.time()
    src = OracleSource(mesh, cam, traj, num_frames=FRAMES,
                       noise_sigma=0.003, seed=3)
    run = node.run(tracker, src, initial_pose=np.asarray(traj(0)))
    rec = {"pos_rmse_m": round(run.position_rmse(), 5),
           "rot_rmse_rad": round(run.rotation_rmse(), 4),
           "wall_s": round(time.time() - t0, 1)}
    results["fixed_config"][kind] = rec
    print(f"fixed-config(ang=6.0) {kind}:", json.dumps(rec), flush=True)
    flush()
print("DONE", flush=True)
