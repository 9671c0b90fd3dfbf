"""TPU experiment 18: trace-based attribution + sort-free resampling A/B.

Open questions from CLAUDE.md / session 11:
  (a) where do the 5.2 ms of the fused sensor step actually go? (the
      kernel's roofline says ~0.5-1 ms; suspicion: pre-pass sorts,
      candidates raycast, pack, occlusion merge writes)
  (b) what is the ~3.5 ms resample-path overhead that persists with an
      identity occ gather? (suspicion: the 20k-element 2-key lax.sort in
      the merged-sort searchsorted)
  (c) does the new blocked-rank sorted_searchsorted_left (no sort, no
      scatter) close the never-resample vs always-resample gap?

Methodology: chained composite steps only (CLAUDE.md); jax.profiler
traces written to benchmarks/traces/{sensor,resample}/ and parsed offline
with benchmarks/parse_trace.py.
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.ops import resample as rs
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


# --- the old merged-sort searchsorted, kept here for the A/B -------------
def merged_sort_ssl(cdf, pos):
    n = cdf.shape[0]
    m = pos.shape[0]
    vals = jnp.concatenate([cdf, pos])
    tags = jnp.concatenate([jnp.ones((n,), jnp.int32),
                            jnp.zeros((m,), jnp.int32)])
    src = jnp.concatenate([jnp.full((n,), m, jnp.int32),
                           jnp.arange(m, dtype=jnp.int32)])
    vals_s, tags_s, src_s = jax.lax.sort((vals, tags, src), num_keys=2)
    cdf_before = jnp.cumsum(tags_s) - tags_s
    out = jnp.zeros((m + 1,), jnp.int32).at[src_s].set(
        cdf_before.astype(jnp.int32))
    return out[:m]


def run_steps(sensor, max_kl, n_steps, label, trace=None):
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
    print(f"{label}: {dtm*1e3:.2f} ms/step", flush=True)
    if trace:
        with jax.profiler.trace(os.path.join(TRACE_DIR, trace)):
            for _ in range(10):
                belief, info = step(belief, z_obs)
            jax.block_until_ready(info.mean_state)
    return dtm


def run_sensor_only(sensor, n_steps, label, trace=None):
    key = jax.random.PRNGKey(0)
    dpos = 0.01 * jax.random.normal(key, (P, 3))
    states = jnp.zeros((P, 1, 13), jnp.float32)
    states = states.at[:, 0, :3].set(ref[:3] + dpos)
    states = states.at[:, 0, 3:7].set(ref[3:7])
    occ = sensor.init_occlusion(P, 0.1)
    # donate occ to match bench.py — without it the ~194 MB occ leaf's
    # buffer lifetime shows up as device idle gaps in the attribution
    # trace and pollutes question (a) (ADVICE r2)
    step = jax.jit(lambda s, o, z: sensor(s, o, z, dt),
                   donate_argnums=(1,))
    o = occ
    ll, o = step(states, o, z_obs)   # warmup (occ buffer is donated)
    jax.block_until_ready(ll)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        ll, o = step(states, o, z_obs)
    jax.block_until_ready(ll)
    dtm = (time.perf_counter() - t0) / n_steps
    print(f"{label}: {dtm*1e3:.2f} ms -> "
          f"{P*cam.num_pixels/dtm/1e9:.2f}e9 evals/s", flush=True)
    if trace:
        with jax.profiler.trace(os.path.join(TRACE_DIR, trace)):
            for _ in range(10):
                ll, o = step(states, o, z_obs)
            jax.block_until_ready(ll)
    return dtm


sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")

# (a) sensor-only attribution trace
run_sensor_only(sensor, 20, "sensor-only (blocked-rank HEAD)",
                trace="sensor")

# (b)/(c) full step: never + always resample, new blocked-rank path
run_steps(sensor, 1e9, 30, "step never-resample blocked-rank")
run_steps(sensor, -1.0, 30, "step always-resample blocked-rank",
          trace="resample")

# A/B: swap the old merged-sort searchsorted into the *resample* call
# site only (systematic_indices). A module-global monkeypatch would also
# change the fused sensor's compaction ladder (raycast_pallas calls the
# same rs.sorted_searchsorted_left), conflating the two paths — the A/B
# must isolate the resample overhead (ADVICE r2).
_orig_sys = rs.systematic_indices


def _sys_merged(key, log_w, num_samples):
    ln, _ = rs.normalize_log_weights(log_w)
    cdf = jnp.cumsum(jnp.exp(ln), axis=-1)
    u = jax.random.uniform(key, ())
    pos = (jnp.arange(num_samples, dtype=jnp.float32) + u) / num_samples
    idx = merged_sort_ssl(cdf, pos)
    return jnp.clip(idx, 0, log_w.shape[-1] - 1).astype(jnp.int32)


rs.systematic_indices = _sys_merged
run_steps(sensor, -1.0, 30, "step always-resample merged-sort")
rs.systematic_indices = _orig_sys

# KL-triggered (realistic) for the record
run_steps(sensor, 1.0, 30, "step kl-triggered blocked-rank")

print("DONE", flush=True)
