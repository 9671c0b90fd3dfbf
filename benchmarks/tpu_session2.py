"""TPU experiment 2: HIGH-precision pack + triangle/pixel compaction,
with stage-level breakdown. Run: PYTHONPATH=/root/repo:/root/.axon_site
nohup python benchmarks/tpu_session2.py > log &"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.ops import deferred, raycast_pallas as rp
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh
from dbot_ros_tpu.ops.raycast import raycast_depth

print("devices:", jax.devices(), flush=True)
P = 10_000
cam = default_kinect_camera(8)
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(model_sigma=0.005)
op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")
ref = jnp.concatenate([jnp.array([0.,0.,0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)
p_pad = (P + 127) // 128 * 128
key = jax.random.PRNGKey(0)
dpos = 0.01 * jax.random.normal(key, (P, 3))
poses = jnp.concatenate([ref[None, :3] + dpos,
                         jnp.tile(ref[None, 3:7], (P, 1))], -1)
states = jnp.zeros((P, 1, 13), jnp.float32).at[:, 0, :7].set(poses)

def bench(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return out, dt

# stage timings
bench("pack_full (HIGH)", jax.jit(lambda s: sensor._pack_full(s, p_pad)), states)
cand = jax.jit(sensor.candidates)(states)
bench("candidates (raycast_ids + dilation)", jax.jit(sensor.candidates), states)
bench("raycast_ids", jax.jit(lambda: deferred.raycast_ids(mesh, ref, cam.rays)))
bench("states_mean", jax.jit(lambda s: se3.states_mean(s[:, 0])), states)
tcap = sensor._tri_cap()
deg = sensor.union_triangles - 1
flat = jnp.sort(cand.reshape(-1))
is_new = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
print("n_uniq:", int(jnp.sum(is_new)), "tcap:", tcap,
      "n_active_px:", int(jnp.sum(jnp.any(cand != deg, axis=1))),
      "pcap:", sensor._active_cap(cam.num_pixels), flush=True)
pos = jnp.cumsum(is_new) - 1
uniq = jnp.full((tcap,), deg, jnp.int32).at[jnp.clip(pos, 0, tcap-1)].set(flat.astype(jnp.int32))
bench("pack_selected", jax.jit(lambda s: sensor._pack_selected(s, p_pad, uniq)), states)

# sensor step
occ = sensor.init_occlusion(P, 0.1)
step_s = jax.jit(lambda s, o, z: sensor(s, o, z, 1.0/30.0))
(_, occ2), dt_s = bench("sensor step", step_s, states, occ, z_obs)
print(f"  -> {P*cam.num_pixels/dt_s:.3e} evals/s (vs_baseline "
      f"{P*cam.num_pixels/dt_s/1.44e9:.2f})", flush=True)

# full filter step
for max_kl, tag in [(1e9, "never-resample"), (-1.0, "always-resample")]:
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                               cam.num_pixels, sensor=sensor)
    step = jax.jit(functools.partial(rbcpf.rbcpf_step, loglik_fn=sensor,
                                     trans_params=tp, dt=1/30.,
                                     max_kl_divergence=max_kl),
                   donate_argnums=(0,))
    belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    t0 = time.perf_counter()
    for _ in range(30):
        belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    dt = (time.perf_counter()-t0)/30
    print(f"{tag}: {dt*1000:.2f} ms/frame ({1/dt:.1f} Hz) "
          f"resampled={bool(info.resampled)}", flush=True)
print("DONE", flush=True)
