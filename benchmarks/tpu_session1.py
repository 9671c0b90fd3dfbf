"""Batched TPU experiment: bench + north-star latency after the
pack-matmul change (one process, run detached)."""
import os, time, functools, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.ops import raycast_pallas as rp
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

# --- stage timing: pack_constants alone
p_pad = (P + 127) // 128 * 128
key = jax.random.PRNGKey(0)
dpos = 0.01 * jax.random.normal(key, (P, 3))
poses = jnp.concatenate([ref[None, :3] + dpos,
                         jnp.tile(ref[None, 3:7], (P, 1))], -1)
pack = jax.jit(lambda p: rp.pack_constants(mesh, p, p_pad))
out = pack(poses); out.block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    out = pack(poses)
out.block_until_ready()
print(f"pack_constants: {(time.perf_counter()-t0)/20*1000:.2f} ms", flush=True)

# --- sensor step (bench.py measurement)
states = jnp.zeros((P, 1, 13), jnp.float32)
states = states.at[:, 0, :7].set(poses)
occ = sensor.init_occlusion(P, 0.1)
step_s = jax.jit(lambda s, o, z: sensor(s, o, z, 1.0/30.0))
ll, occ2 = step_s(states, occ, z_obs); ll.block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    ll, occ = step_s(states, occ, z_obs)
ll.block_until_ready()
dt = (time.perf_counter()-t0)/20
print(f"sensor step: {dt*1000:.2f} ms -> {P*cam.num_pixels/dt:.3e} evals/s "
      f"(vs_baseline {P*cam.num_pixels/dt/1.44e9:.2f})", flush=True)

# --- full filter step latency
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
