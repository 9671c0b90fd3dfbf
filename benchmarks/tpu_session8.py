"""TPU experiment 8: optimization_barrier'd dots -> pack & step latency."""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh
from dbot_ros_tpu.ops.raycast import raycast_depth

print("devices:", jax.devices(), flush=True)

def timed(name, fn, state, iters=30):
    state = fn(state); jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.3f} ms", flush=True)
    return dt

# clean barrier'd dot: chain perturbation materialized BEFORE the dot
key = jax.random.PRNGKey(0)
M0 = jax.random.normal(key, (14080, 37), jnp.float32)
F0 = jax.random.normal(key, (37, 10112), jnp.float32)
def dot_chained(c):
    s, _ = c
    M, F = jax.lax.optimization_barrier((M0 + s * 1e-30, F0))
    out = jnp.dot(M, F, precision=jax.lax.Precision.HIGH)
    return (out[0, 0] * 1e-30, out)
timed("barrier dot 14080x37x10112 -> HBM", jax.jit(dot_chained),
      (0.0, jnp.zeros((14080, 10112))))

P = 10_000
cam = default_kinect_camera(8)
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(model_sigma=0.005)
op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
ref = jnp.concatenate([jnp.array([0.,0.,0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")
p_pad = (P + 127) // 128 * 128
poses = jnp.concatenate([ref[None, :3] + 0.01*jax.random.normal(key,(P,3)),
                         jnp.tile(ref[None, 3:7], (P, 1))], -1)
states0 = jnp.zeros((P, 1, 13), jnp.float32).at[:, 0, :7].set(poses)

# pack_full chained through states (barrier'd inside pack now)
def pack_chained(c):
    s, _ = c
    st = states0.at[0, 0, 0].add(s * 1e-30)
    gt = sensor._pack_full(st, p_pad)
    return (gt[0, 0, 0] * 1e-30, gt)
timed("pack_full (barrier)", jax.jit(pack_chained),
      (0.0, jnp.zeros((mesh.padded_triangles, 10 * (p_pad // 128), 128))))

occ0 = sensor.init_occlusion(P, 0.1)
dt_s = timed("sensor step", jax.jit(
    lambda o: sensor(states0, o, z_obs, 1.0/30.0)[1]), occ0)
print(f"  evals/s {P*cam.num_pixels/dt_s:.3e} vs_baseline "
      f"{P*cam.num_pixels/dt_s/1.44e9:.2f}", flush=True)
belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                           cam.num_pixels, sensor=sensor)
stepn = jax.jit(functools.partial(rbcpf.rbcpf_step, loglik_fn=sensor,
                                  trans_params=tp, dt=1/30.,
                                  max_kl_divergence=1e9),
                donate_argnums=(0,))
timed("rbcpf never-resample", lambda b: stepn(b, z_obs)[0], belief)
belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                           cam.num_pixels, sensor=sensor)
stepa = jax.jit(functools.partial(rbcpf.rbcpf_step, loglik_fn=sensor,
                                  trans_params=tp, dt=1/30.,
                                  max_kl_divergence=-1.0),
                donate_argnums=(0,))
timed("rbcpf always-resample", lambda b: stepa(b, z_obs)[0], belief)

# deferred backend with barrier
sensor_d = make_rb_sensor(mesh, cam, bp, op, backend="deferred")
occd = jnp.full((P, cam.num_pixels), 0.1)
timed("deferred sensor step", jax.jit(
    lambda o: sensor_d(states0, o, z_obs, 1.0/30.0)[1]), occd, iters=10)
print("DONE", flush=True)
