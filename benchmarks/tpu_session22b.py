"""TPU experiment 22b: f32 control on the session-22 layout.

Session 22 (bf16 occ, pr rounded to 8, 3-D occ blocks) measured
sensor 2.63 / never 2.69 / always 3.70 / kl 3.90 ms vs the f32 flat
HEAD's 2.46 / 2.21 / 5.93 / 5.92. This control runs occ_dtype=f32 on
the SAME new layout to attribute the never-resample regression:
dtype-convert cost vs (pr=80 + 3-D block) layout cost.
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


def run_steps(sensor, max_kl, n_steps, label):
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
    return dtm


def run_sensor_only(sensor, n_steps, label):
    key = jax.random.PRNGKey(0)
    dpos = 0.01 * jax.random.normal(key, (P, 3))
    states = jnp.zeros((P, 1, 13), jnp.float32)
    states = states.at[:, 0, :3].set(ref[:3] + dpos)
    states = states.at[:, 0, 3:7].set(ref[3:7])
    occ = sensor.init_occlusion(P, 0.1)
    step = jax.jit(lambda s, o, z: sensor(s, o, z, dt),
                   donate_argnums=(1,))
    o = occ
    ll, o = step(states, o, z_obs)
    jax.block_until_ready(ll)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        ll, o = step(states, o, z_obs)
    jax.block_until_ready(ll)
    dtm = (time.perf_counter() - t0) / n_steps
    print(f"{label}: {dtm*1e3:.2f} ms -> "
          f"{P*cam.num_pixels/dtm/1e9:.2f}e9 evals/s", flush=True)
    return dtm


sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                        occ_dtype=jnp.float32)
run_sensor_only(sensor, 30, "sensor-only f32 newlayout nb=64")
run_steps(sensor, 1e9, 30, "step never f32 newlayout")
run_steps(sensor, -1.0, 30, "step always f32 newlayout")
run_steps(sensor, 1.0, 30, "step kl f32 newlayout")
print("DONE", flush=True)
