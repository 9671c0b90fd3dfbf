"""TPU experiment 26: production-operating-point certification.

Two legs, one process (tunnel compiles are slow — batch everything):

A. Accuracy at the north-star operating point (VERDICT r3 item 1):
   closed-loop tracking on oracle-rendered stress sequences (nominal /
   occluder / dropout / fast_rot) at 10k particles, 80x60 (Kinect
   intrinsics, downsample 8), production fused-pallas sensor defaults
   (2 candidates / 2-px dilation, bf16 occlusion, compaction ladder),
   KL-triggered resampling. Writes eval_tpu.json at the repo root.

B. Distributed-step overhead after the cond-free resample rework
   (VERDICT r3 item 2): plain KL step vs axis-size-1 shard_map step
   (counts exchange) at 10k — the one hardware proxy for the shard_map
   machinery tax (8.21 ms vs 3.90 before the rework, session 23).
   Timing blocks on the FULL belief pytree (CLAUDE.md timing trap).
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

if os.environ.get("S26_CPU"):                       # CPU smoke mode
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu import config as cfg
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.parallel import dist_filter
from dbot_ros_tpu.runtime import node
from dbot_ros_tpu.runtime.sources import OracleSource
from dbot_ros_tpu.trackers.particle import ParticleTracker
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import box_mesh, icosphere_mesh, l_shape_mesh

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("S26_OUT", os.path.join(ROOT, "eval_tpu.json"))
P = int(os.environ.get("S26_P", 10_000))
FRAMES = int(os.environ.get("S26_FRAMES", 60))
WINDOWS = int(os.environ.get("S26_WINDOWS", 3))
WSTEPS = int(os.environ.get("S26_WSTEPS", 60))

print("devices:", jax.devices(), flush=True)

import json as _json  # noqa: E402 (re-import safe)
results = _json.load(open(OUT)) if os.path.exists(OUT) else {}
# merge-don't-wipe: sessions 27-31 append their own sections
results.update({"particles": P, "resolution": "80x60", "frames": FRAMES,
                "backend": "pallas (production defaults: 2 candidates/"
                           "2-px dilation, bf16 occ, compaction ladder)"})
results.setdefault("accuracy", {})
results.setdefault("dist_overhead_ms", {})


def flush():
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)


# --------------------------------------------------------------- leg A
cam = default_kinect_camera(8)                      # 80x60 = 4800 px
mesh = l_shape_mesh()
occluder = box_mesh(0.03, 0.30, 0.02)
start = jnp.concatenate([jnp.array([0.0, 0.0, 0.55]), se3.quat_identity()])


def traj_nominal(t):
    ang = 0.03 * t
    q = se3.so3_exp_quat(jnp.array([0.0, ang, 0.0]))
    p = start.at[0].add(0.0015 * t).at[1].add(0.02 * np.sin(0.08 * t))
    return jnp.concatenate([p[:3], se3.quat_multiply(q, start[3:7])])[None]


def traj_fast_rot(t):
    ang = 0.145 * t                                  # 4.3 rad/s at 30 Hz
    axis = jnp.array([0.5, 0.8, 0.33])
    axis = axis / jnp.linalg.norm(axis)
    q = se3.so3_exp_quat(axis * ang)
    p = start.at[0].add(0.001 * t)
    return jnp.concatenate([p[:3], se3.quat_multiply(q, start[3:7])])[None]


def occ_fn(t):
    # bar sweeps left->right 10 cm in front of the object, frames 8..40
    x = -0.14 + 0.009 * max(0, t - 8)
    return np.array([x, 0.0, 0.45, 1, 0, 0, 0], np.float32)


def make_src(kind):
    kw = {}
    traj = traj_fast_rot if kind == "fast_rot" else traj_nominal
    if kind == "occluder":
        kw = dict(occluder=occluder, occluder_fn=occ_fn)
    elif kind == "dropout":
        kw = dict(dropout_prob=0.5, dropout_frames=(15, 28))
    return OracleSource(mesh, cam, traj, num_frames=FRAMES,
                        noise_sigma=0.003, seed=3, **kw)


def make_tracker(angular_sigma):
    obs = cfg.ObservationConfig(model_sigma=0.005, sigma_factor=0.0)
    trans = cfg.TransitionConfig(linear_acceleration_sigma=0.4,
                                 angular_acceleration_sigma=angular_sigma,
                                 damping=6.0)
    opts = ({"interpret": True, "nb": 16}
            if os.environ.get("S26_CPU") else {})
    conf = cfg.ParticleTrackerConfig(
        observation=obs, transition=trans, evaluation_count=P,
        max_kl_divergence=0.8, backend="pallas", seed=1,
        backend_options=opts)
    return ParticleTracker(conf, meshes=[mesh], camera=cam)


def run_leg(tracker, kind):
    t0 = time.time()
    src = make_src(kind)
    init = np.asarray(src.trajectory_fn(0))
    run = node.run(tracker, src, initial_pose=init)
    lat = [m.latency_s for m in run.metrics.records[2:]]
    rec = {
        "pos_rmse_m": round(run.position_rmse(), 5),
        "rot_rmse_rad": round(run.rotation_rmse(), 4),
        "pos_max_m": round(float(run.position_errors()[FRAMES // 3:].max()),
                           5),
        "rot_max_rad": round(float(run.rotation_errors()[FRAMES // 3:].max()),
                             4),
        "median_track_ms": round(1e3 * float(np.median(lat)), 2),
        "resampled_frames": run.metrics.resample_count(),
        "wall_s": round(time.time() - t0, 1),
    }
    results["accuracy"][kind] = rec
    print(kind, json.dumps(rec), flush=True)
    flush()


tracker = make_tracker(2.5)
for kind in ("nominal", "occluder", "dropout"):
    run_leg(tracker, kind)

# fast_rot needs angular-acceleration headroom (protocol-matched process
# noise, as in EVAL.md note 2) -> separate tracker/compile
run_leg(make_tracker(6.0), "fast_rot")


# --------------------------------------------------------------- leg B
cam_b = default_kinect_camera(8)
mesh_b = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(model_sigma=0.005)
op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
ref = jnp.concatenate([jnp.array([0., 0., 0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh_b, ref, cam_b.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)
dt = 1 / 30.
sensor = make_rb_sensor(mesh_b, cam_b, bp, op, backend="pallas",
                        **({"interpret": True, "nb": 16}
                           if os.environ.get("S26_CPU") else {}))


def time_windows(step_fn, belief, n_windows=WINDOWS, n_steps=WSTEPS):
    best = np.inf
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            belief, aux = step_fn(belief, z_obs)
        jax.block_until_ready((belief, aux))
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return best * 1e3, belief


def run_plain(max_kl, label):
    import functools
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                               cam_b.num_pixels, sensor=sensor)
    step = jax.jit(functools.partial(
        rbcpf.rbcpf_step, loglik_fn=sensor, trans_params=tp, dt=dt,
        max_kl_divergence=max_kl), donate_argnums=(0,))
    belief, info = step(belief, z_obs)
    jax.block_until_ready((belief, info))
    ms, _ = time_windows(step, belief)
    results["dist_overhead_ms"][label] = round(ms, 2)
    print(f"{label}: {ms:.2f} ms/step", flush=True)
    flush()


def run_dist(max_kl, label, exchange="counts"):
    mesh1 = dist_filter.make_particle_mesh(1)
    belief = dist_filter.init_distributed_belief(
        jax.random.PRNGKey(0), ref, P, mesh1, cam_b.num_pixels,
        sensor=sensor)
    dstep = dist_filter.make_distributed_step(
        mesh1, sensor, tp, dt, max_kl_divergence=max_kl,
        exchange=exchange)

    def step_fn(b, z):
        b, ms_, ess = dstep(b, z)
        return b, (ms_, ess)

    belief, aux = step_fn(belief, z_obs)
    jax.block_until_ready((belief, aux))
    ms, _ = time_windows(step_fn, belief)
    results["dist_overhead_ms"][label] = round(ms, 2)
    print(f"{label}: {ms:.2f} ms/step", flush=True)
    flush()


run_plain(1.0, "plain_kl")
run_dist(1.0, "axis1_counts_kl")
run_dist(1e9, "axis1_counts_never")
print("DONE", flush=True)
