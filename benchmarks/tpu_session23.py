"""TPU experiment 23: distributed-step overhead re-measure on bf16 HEAD.

docs/SCALING.md's axis-size-1 shard_map bound (9.69 vs 6.66 ms KL
@10k) predates bf16 occlusion storage — the exchange traffic model and
the plain-step baseline both changed (session 22: KL 3.90 ms). One
chip only: this bounds the shard_map + exchange *machinery* overhead,
not real ICI transfer.

Legs: plain KL step (control), axis-1 distributed step with the
default counts exchange, and with the all_gather exchange.
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
from dbot_ros_tpu.parallel import dist_filter

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
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")


def run_plain(max_kl, n_steps, label):
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


def run_dist(exchange, n_steps, label):
    mesh1 = dist_filter.make_particle_mesh(1)
    belief = dist_filter.init_distributed_belief(
        jax.random.PRNGKey(0), ref, P, mesh1, cam.num_pixels,
        sensor=sensor)
    dstep = dist_filter.make_distributed_step(
        mesh1, sensor, tp, dt, max_kl_divergence=1.0, exchange=exchange)
    belief, ms, ess = dstep(belief, z_obs)
    jax.block_until_ready(ms)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        belief, ms, ess = dstep(belief, z_obs)
    jax.block_until_ready(ms)
    dtm = (time.perf_counter() - t0) / n_steps
    print(f"{label}: {dtm*1e3:.2f} ms/step", flush=True)


# control = session 22's plain KL step on the same sensor: 3.90 ms
run_dist("counts", 30, "axis-1 dist step, counts exchange")
print("DONE", flush=True)
