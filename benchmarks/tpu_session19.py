"""TPU experiment 19 (round 3): resample-residual attribution + dist overhead.

Open items from VERDICT.md round 2 (#4 "close the perf ledger"):
  (a) attribute the ~3.5 ms always-vs-never resample gap at the 10k north
      star. Session-18's resample trace shows per step: conditional.1
      2.44 ms, copy.211/212 ~0.59 ms each, reshape.62/.581 ~0.59 ms each,
      broadcast_select_fusion.4 0.85 ms — but there is no never-resample
      trace to diff against. Capture both here.
  (b) pack_constants cost on HEAD (was ~10.7 ms as an einsum chain; now a
      single MXU matmul — attribute from the sensor trace).
  (c) shard_map overhead: axis-size-1 distributed step vs the plain jitted
      step (docs/SCALING.md communication model sanity bound).

Methodology: chained composite steps only (CLAUDE.md); traces →
benchmarks/traces/{step_never,step_always}/, parsed with parse_trace.py.
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh

print("devices:", jax.devices(), flush=True)

P = 10_000
cam = default_kinect_camera(8)
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(model_sigma=0.005)
op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
ref = jnp.concatenate([jnp.array([0., 0., 0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)
dt = 1 / 30.

TRACE_DIR = os.path.join(os.path.dirname(__file__), "traces")
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")


def run_steps(max_kl, n_steps, label, trace=None):
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                               cam.num_pixels, sensor=sensor)
    step = jax.jit(functools.partial(
        rbcpf.rbcpf_step, loglik_fn=sensor, trans_params=tp, dt=dt,
        max_kl_divergence=max_kl), donate_argnums=(0,))
    belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    dtm = (time.perf_counter() - t0) / n_steps
    print(f"{label}: {dtm*1e3:.2f} ms/step ({1/dtm:.1f} Hz) "
          f"resampled={bool(info.resampled)}", flush=True)
    if trace:
        with jax.profiler.trace(os.path.join(TRACE_DIR, trace)):
            for _ in range(10):
                belief, info = step(belief, z_obs)
            jax.block_until_ready(info.mean_state)
    return dtm


# (a) never vs always traces for the diff
run_steps(1e9, 30, "step never-resample", trace="step_never")
run_steps(-1.0, 30, "step always-resample", trace="step_always")
run_steps(1.0, 30, "step kl-triggered")

# (c) axis-size-1 shard_map distributed step: bound distribution overhead
from dbot_ros_tpu.parallel import dist_filter
mesh1 = dist_filter.make_particle_mesh(1)
belief = dist_filter.init_distributed_belief(
    jax.random.PRNGKey(0), ref, P, mesh1, cam.num_pixels, sensor=sensor)
dstep = dist_filter.make_distributed_step(mesh1, sensor, tp, dt,
                                          max_kl_divergence=1.0)
belief, mean_state, ess = dstep(belief, z_obs)
jax.block_until_ready(mean_state)
t0 = time.perf_counter()
for _ in range(30):
    belief, mean_state, ess = dstep(belief, z_obs)
jax.block_until_ready(mean_state)
dtm = (time.perf_counter() - t0) / 30
print(f"dist step (1-dev mesh, kl=1.0): {dtm*1e3:.2f} ms/step", flush=True)

print("DONE", flush=True)
