"""TPU experiment 11: decompose the 4.6 ms resample cost.

Session 10: windowed lineage gather == jnp.take end-to-end (10.25 ms
always-resample vs 5.5/5.66 never-resample, both modes). Questions:
  (a) what is the realistic parent-index span per 128-lane block (does
      the windowed fast path even engage)?
  (b) what does the resample branch cost with an IDENTITY occ gather
      (cost floor of the cond + state gather + buffer plumbing)?
  (c) take vs windowed vs windowed with a deeper ladder.
All timings are chained composite steps (the only valid methodology).
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


def run_steps(sensor, max_kl, n_steps, occ_gather=None):
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                               cam.num_pixels, sensor=sensor)
    if occ_gather is not None:
        class Wrap:
            def __call__(self, s, o, z, d):
                return sensor(s, o, z, d)
        w = Wrap()
        w.init_occlusion = sensor.init_occlusion
        w.gather_occlusion = occ_gather
        loglik = w
    else:
        loglik = sensor
    step = jax.jit(functools.partial(
        rbcpf.rbcpf_step, loglik_fn=loglik, trans_params=tp, dt=dt,
        max_kl_divergence=max_kl), donate_argnums=(0,))
    belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    return (time.perf_counter() - t0) / n_steps, belief


# ---- (a) realistic span statistics -------------------------------------
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                        lineage_gather="take")
_, belief = run_steps(sensor, 1e9, 3)  # 4 weight updates, no resample


@jax.jit
def span_stats(log_w, key):
    par = rs.systematic_indices(key, log_w, 10112)
    pb = par.reshape(-1, 128)
    lo = jnp.min(pb, axis=1)
    spans = jnp.max(pb, axis=1) - lo + 1
    ln, _ = rs.normalize_log_weights(log_w)
    ess = jnp.exp(-jax.scipy.special.logsumexp(2.0 * ln))
    return spans, ess


spans, ess = span_stats(
    jnp.pad(belief.log_weights, (0, 112), constant_values=-jnp.inf),
    jax.random.PRNGKey(7))
import numpy as np
s = np.asarray(spans)
print(f"ESS after 4 updates: {float(ess):.1f}", flush=True)
print(f"span per 128-block: max={s.max()} p99={np.percentile(s, 99):.0f} "
      f"median={np.median(s):.0f} frac<=256: {(s <= 256).mean():.3f} "
      f"frac<=1024: {(s <= 1024).mean():.3f}", flush=True)

# ---- (b)/(c) step-cost decomposition ------------------------------------
ms, _ = run_steps(sensor, 1e9, 30)
print(f"never-resample (take):              {ms*1e3:.2f} ms", flush=True)

ident = lambda occ, idx: occ
ms, _ = run_steps(sensor, -1.0, 30, occ_gather=ident)
print(f"always-resample IDENTITY occ gather: {ms*1e3:.2f} ms", flush=True)

ms, _ = run_steps(sensor, -1.0, 30)
print(f"always-resample take:                {ms*1e3:.2f} ms", flush=True)

sensor_w = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                          lineage_gather="windowed")
ms, _ = run_steps(sensor_w, -1.0, 30)
print(f"always-resample windowed(256,1024):  {ms*1e3:.2f} ms", flush=True)


def deep_gather(occ_k, parent_idx):
    p = parent_idx.shape[0]
    p_pad = (p + 127) // 128 * 128
    n_pad = occ_k.shape[0] // (p_pad // 128)
    view = occ_k.reshape(n_pad, p_pad)
    idx_full = jnp.concatenate(
        [parent_idx.astype(jnp.int32),
         jnp.arange(p, p_pad, dtype=jnp.int32)])
    return rs.windowed_lane_gather(
        view, idx_full, windows=(256, 512, 2048, 8192)).reshape(
            occ_k.shape[0], 128)


ms, _ = run_steps(sensor, -1.0, 30, occ_gather=deep_gather)
print(f"always-resample windowed deep ladder:{ms*1e3:.2f} ms", flush=True)

# fixed-window variants to map the cost curve
for w in (256, 1024):
    def g(occ_k, parent_idx, w=w):
        p = parent_idx.shape[0]
        p_pad = (p + 127) // 128 * 128
        n_pad = occ_k.shape[0] // (p_pad // 128)
        view = occ_k.reshape(n_pad, p_pad)
        idx_full = jnp.concatenate(
            [parent_idx.astype(jnp.int32),
             jnp.arange(p, p_pad, dtype=jnp.int32)])
        # force the fixed-w fast path unconditionally (EXACTNESS NOT
        # GUARANTEED if span > w — this is a timing probe only)
        pb = jnp.clip(idx_full, 0, p_pad - 1).reshape(-1, 128)
        lo = jnp.minimum(jnp.min(pb, axis=1), p_pad - w)
        iw = jnp.arange(w, dtype=jnp.int32)

        def body(out, b):
            slab = jax.lax.dynamic_slice(view, (0, lo[b]), (n_pad, w))
            onehot = (iw[:, None] == (pb[b] - lo[b])[None, :]).astype(
                view.dtype)
            blk = jax.lax.dot(slab, onehot,
                              precision=jax.lax.Precision.HIGHEST)
            return jax.lax.dynamic_update_slice(out, blk, (0, b * 128)), 0

        out, _ = jax.lax.scan(body, jnp.zeros_like(view),
                              jnp.arange(pb.shape[0], dtype=jnp.int32))
        return out.reshape(occ_k.shape[0], 128)

    ms, _ = run_steps(sensor, -1.0, 30, occ_gather=g)
    print(f"always-resample FORCED w={w:5d}:      {ms*1e3:.2f} ms",
          flush=True)

print("DONE", flush=True)
