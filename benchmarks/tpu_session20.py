"""TPU experiment 20 (round 3): in-place scatter merge + resample A/Bs.

Session-19 attribution at the 10k north star (v5e):
  * sensor common path: 2.92 ms, of which merge-back = inverse row
    gather (fusion.15, 0.51) + full-map select (broadcast_select, 0.85);
    the Pallas kernel itself (while.1) is only ~0.18 ms.
  * always-resample adds ~3.0 ms: gather fusion 0.66 + two layout
    reshapes 1.18 + two full-map copies 1.17.

Experiments:
  (a) merge="scatter" (new in-place dynamic-index Pallas row scatter) vs
      merge="select" — expect ~-1.2 ms on EVERY frame.
  (b) always-resample without donation — are the two copies donation
      (aliasing) artifacts?
  (c) lineage_gather="windowed" vs "take" under the scatter merge.
  (d) full never/always/kl step latencies for bench.py's new fields.
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


def run_sensor_only(sensor, n_steps, label, trace=None):
    key = jax.random.PRNGKey(0)
    dpos = 0.01 * jax.random.normal(key, (P, 3))
    states = jnp.zeros((P, 1, 13), jnp.float32)
    states = states.at[:, 0, :3].set(ref[:3] + dpos)
    states = states.at[:, 0, 3:7].set(ref[3:7])
    occ = sensor.init_occlusion(P, 0.1)
    step = jax.jit(lambda s, o, z: sensor(s, o, z, dt),
                   donate_argnums=(1,))
    ll, occ = step(states, occ, z_obs)
    jax.block_until_ready(ll)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        ll, occ = step(states, occ, z_obs)
    jax.block_until_ready(ll)
    dtm = (time.perf_counter() - t0) / n_steps
    print(f"{label}: {dtm*1e3:.2f} ms -> "
          f"{P*cam.num_pixels/dtm/1e9:.2f}e9 evals/s", flush=True)
    if trace:
        with jax.profiler.trace(os.path.join(TRACE_DIR, trace)):
            for _ in range(10):
                ll, occ = step(states, occ, z_obs)
            jax.block_until_ready(ll)
    return dtm


def run_steps(sensor, max_kl, n_steps, label, trace=None, donate=True):
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                               cam.num_pixels, sensor=sensor)
    step = jax.jit(functools.partial(
        rbcpf.rbcpf_step, loglik_fn=sensor, trans_params=tp, dt=dt,
        max_kl_divergence=max_kl),
        donate_argnums=(0,) if donate else ())
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


sensor_sc = make_rb_sensor(mesh, cam, bp, op, backend="pallas")
sensor_sel = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                            merge="select")

# (a) sensor-only A/B
run_sensor_only(sensor_sc, 20, "sensor-only scatter-merge",
                trace="sensor_scatter")
run_sensor_only(sensor_sel, 20, "sensor-only select-merge")

# (d) full step with scatter merge
run_steps(sensor_sc, 1e9, 30, "step never scatter")
run_steps(sensor_sc, -1.0, 30, "step always scatter",
          trace="step_always_scatter")
run_steps(sensor_sc, 1.0, 30, "step kl scatter")

# (b) donation A/B on the resample path
run_steps(sensor_sc, -1.0, 30, "step always scatter NO-donate",
          donate=False)

# (c) windowed lineage gather under scatter merge
sensor_w = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                          lineage_gather="windowed")
run_steps(sensor_w, -1.0, 30, "step always scatter windowed-gather")

print("DONE", flush=True)
