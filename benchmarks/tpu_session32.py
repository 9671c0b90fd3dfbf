"""TPU experiment 32: the GF made fast — deferred sigma renders.

VERDICT r4 item 1: the GF device step was 17.1 ms (58 Hz) at the
production frame size, attributed (by inspection, never traced) to the
exact scan-over-triangles renders of 25 sigma poses. This session:

  1. re-measures the exact-backend chained GF step at HEAD (s31 repro),
  2. measures the deferred-backend step (ops/deferred.make_sigma_renderer:
     one exact reference scan per IPLF iteration + candidate one-hot MXU
     pass for the 25 sigma poses) on the same scene,
  3. repeats both on the bench icosphere (1280 tris — the render-heavy
     regime; l_shape is 20 tris padded to 128, where the exact scan is
     only part of the cost),
  4. measures multi-scene SERVING: the vmapped batched GF step
     (rgf.make_batched_step) at S = 4/8/16 scenes — streams/chip at
     30 Hz (P7 for the second estimator, VERDICT r4 item 5),
  5. re-certifies closed-loop accuracy (nominal + occluder protocols,
     production 80x60) with the deferred backend, same methodology as
     session 30,
  6. optionally dumps profiler traces of (1) and (2) for attribution
     (S32_TRACE=1).

Timing: bench.py methodology — chained steps, min over windows, block on
the whole belief pytree (CLAUDE.md timing trap).

Appends to eval_tpu.json: rgf_step_ms (updated), rgf_step_deferred_ms,
rgf_step_icosphere, rgf_serving, rgf_production (deferred rows).
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

if os.environ.get("S32_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu import config as cfg
from dbot_ros_tpu.filters import rgf
from dbot_ros_tpu.models import beam as bm
from dbot_ros_tpu.models import occlusion as om
from dbot_ros_tpu.models import transition
from dbot_ros_tpu.ops.deferred import make_sigma_renderer
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh, l_shape_mesh

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("S32_OUT", os.path.join(ROOT, "eval_tpu.json"))
WINDOWS = int(os.environ.get("S32_WINDOWS", 3))
WSTEPS = int(os.environ.get("S32_WSTEPS", 30))
TRACE = bool(os.environ.get("S32_TRACE"))

print("devices:", jax.devices(), flush=True)

cam = default_kinect_camera(8)
bp = bm.make_beam_params(model_sigma=0.005, sigma_factor=0.0)
op = om.make_occlusion_params()
tp = transition.make_transition_params(0.4, 2.5, damping=6.0)
pose = jnp.concatenate([jnp.array([0.0, 0.0, 0.55]), se3.quat_identity()])

results = json.load(open(OUT)) if os.path.exists(OUT) else {}


def save():
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)


def make_step(mesh, backend, batch=None):
    if backend == "exact":
        def render_fn(poses):
            return raycast_depth(mesh, poses, cam.rays)
    else:
        render_fn = make_sigma_renderer([mesh], cam.rays, cam.height,
                                        cam.width)
    kw = dict(render_fn=render_fn, trans_params=tp, dt=1.0 / 30.0,
              bp=bp, iterations=6, trust_sigma=1.5, occ_params=op)
    if batch is None:
        return jax.jit(functools.partial(rgf.rgf_step, **kw),
                       donate_argnums=(0,))
    return jax.jit(rgf.make_batched_step(**kw), donate_argnums=(0,))


def time_chained(step, belief, z):
    belief, info = step(belief, z)
    jax.block_until_ready((belief, info))
    best = np.inf
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(WSTEPS):
            belief, info = step(belief, z)
        jax.block_until_ready((belief, info))
        best = min(best, (time.perf_counter() - t0) / WSTEPS)
    return best * 1e3, belief


def scene(mesh):
    d = raycast_depth(mesh, pose, cam.rays, 128)
    z = jnp.where(jnp.isfinite(d), d, 2.0)
    b = rgf.init_belief(jax.random.PRNGKey(0), pose,
                        num_pixels=cam.num_pixels, first_frame=z,
                        initial_occlusion_prob=0.1)
    return z, b


# ---- 1/2: l_shape exact vs deferred (s31 parity scene)
mesh_l = l_shape_mesh()
z_l, _ = scene(mesh_l)
for backend, key in (("exact", "rgf_step_ms"),
                     ("deferred", "rgf_step_deferred_ms")):
    step = make_step(mesh_l, backend)
    _, b_l = scene(mesh_l)           # fresh: the step donates its belief
    t0 = time.time()
    ms, bout = time_chained(step, b_l, z_l)
    assert np.isfinite(np.asarray(bout.mean)).all()
    results[key] = {"ms": round(ms, 3), "hz": round(1e3 / ms, 1),
                    "config": "80x60, 6 iterations, occ memory, l_shape",
                    "compile_s": round(time.time() - t0, 1)}
    print(key, json.dumps(results[key]), flush=True)
    save()
    if TRACE:
        tdir = os.path.join(ROOT, "benchmarks",
                            f"session32_trace_{backend}")
        with jax.profiler.trace(tdir):
            bb = bout
            for _ in range(3):
                bb, info = step(bb, z_l)
            jax.block_until_ready((bb, info))
        print("trace ->", tdir, flush=True)

# ---- 3/4: icosphere (render-heavy regime, bench mesh)
mesh_i = icosphere_mesh(radius=0.06, subdivisions=3)
z_i, _ = scene(mesh_i)
results["rgf_step_icosphere"] = {}
for backend in ("exact", "deferred"):
    step = make_step(mesh_i, backend)
    _, b_i = scene(mesh_i)
    ms, bout = time_chained(step, b_i, z_i)
    assert np.isfinite(np.asarray(bout.mean)).all()
    results["rgf_step_icosphere"][backend] = {
        "ms": round(ms, 3), "hz": round(1e3 / ms, 1)}
    print("icosphere", backend,
          json.dumps(results["rgf_step_icosphere"][backend]), flush=True)
    save()

# ---- 5: multi-scene serving (deferred, l_shape)
results["rgf_serving"] = {"config": "80x60, 6 iter, occ memory, "
                                    "deferred, batched vmap"}
for S in (4, 8, 16):
    step = make_step(mesh_l, "deferred", batch=S)
    bb = rgf.stack_beliefs([
        rgf.init_belief(jax.random.PRNGKey(s), pose,
                        num_pixels=cam.num_pixels, first_frame=z_l,
                        initial_occlusion_prob=0.1) for s in range(S)])
    zz = jnp.broadcast_to(z_l, (S, cam.num_pixels))
    ms, bout = time_chained(step, bb, zz)
    assert np.isfinite(np.asarray(bout.mean)).all()
    per_scene = ms / S
    streams30 = int((1000.0 / 30.0) / per_scene)
    results["rgf_serving"][f"S{S}"] = {
        "ms_per_step": round(ms, 3),
        "ms_per_scene": round(per_scene, 3),
        "scene_fps": round(1e3 / per_scene, 1),
        "streams_at_30hz": streams30}
    print(f"serving S={S}:",
          json.dumps(results["rgf_serving"][f"S{S}"]), flush=True)
    save()

# ---- 6: closed-loop accuracy, deferred backend (session-30 protocol)
from dbot_ros_tpu.runtime import node
from dbot_ros_tpu.runtime.sources import OracleSource
from dbot_ros_tpu.trackers.gaussian import GaussianTracker
from dbot_ros_tpu.utils.mesh import box_mesh

FRAMES = int(os.environ.get("S32_FRAMES", 60))
occluder = box_mesh(0.03, 0.30, 0.02)
start = pose


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
tracker = GaussianTracker(conf, meshes=[mesh_l], camera=cam)
results.setdefault("rgf_production", {})
for kind in ("nominal", "occluder"):
    kw = (dict(occluder=occluder, occluder_fn=occ_fn)
          if kind == "occluder" else {})
    t0 = time.time()
    src = OracleSource(mesh_l, cam, traj, num_frames=FRAMES,
                       noise_sigma=0.003, seed=3, **kw)
    run = node.run(tracker, src, initial_pose=np.asarray(traj(0)))
    lat = [m.latency_s for m in run.metrics.records[2:]]
    rec = {"pos_rmse_m": round(run.position_rmse(), 5),
           "rot_rmse_rad": round(run.rotation_rmse(), 4),
           "pos_max_m": round(float(
               run.position_errors()[FRAMES // 3:].max()), 5),
           "median_track_ms": round(1e3 * float(np.median(lat)), 2),
           "backend": "deferred",
           "wall_s": round(time.time() - t0, 1)}
    results["rgf_production"][kind + "_deferred"] = rec
    print(f"rgf {kind} (deferred):", json.dumps(rec), flush=True)
    save()
print("DONE", flush=True)
