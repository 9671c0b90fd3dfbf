"""TPU experiment 25: attribute the session-22 layout cost.

The new layout (pr rounded to 8, 3-D occ blocks, 3-D scatter DMA)
costs 0.2-0.5 ms on the sensor/never path vs the old flat f32 layout
(session 22b control). Candidates: (a) the (nb, pr, 128) occ BlockSpec
DMA pattern, (b) the per-pixel 3-D scatter-merge slices, (c) the pad
group itself. A/B: sensor-only at nb in {32, 64} x merge in
{scatter, select} on bf16 HEAD.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp
from dbot_ros_tpu.models import beam, occlusion
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
ref = jnp.concatenate([jnp.array([0., 0., 0.8]), se3.quat_identity()])
zt = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(zt), zt, 2.0)
dt = 1 / 30.


def run_sensor_only(sensor, n_steps, label):
    key = jax.random.PRNGKey(0)
    dpos = 0.01 * jax.random.normal(key, (P, 3))
    states = jnp.zeros((P, 1, 13), jnp.float32)
    states = states.at[:, 0, :3].set(ref[:3] + dpos)
    states = states.at[:, 0, 3:7].set(ref[3:7])
    o = sensor.init_occlusion(P, 0.1)
    step = jax.jit(lambda s, o, z: sensor(s, o, z, dt),
                   donate_argnums=(1,))
    ll, o = step(states, o, z_obs)
    jax.block_until_ready((ll, o))

    def window():
        nonlocal o
        t0 = time.perf_counter()
        for _ in range(n_steps):
            ll, o2 = step(states, o, z_obs)
            o = o2
        jax.block_until_ready((ll, o))
        return (time.perf_counter() - t0) / n_steps

    dtm = min(window() for _ in range(3))
    print(f"{label}: {dtm*1e3:.2f} ms", flush=True)
    return dtm


for nb in (64, 32):
    for merge in ("scatter", "select"):
        s = make_rb_sensor(mesh, cam, bp, op, backend="pallas", nb=nb,
                           merge=merge)
        run_sensor_only(s, 30, f"sensor nb={nb} merge={merge}")
print("DONE", flush=True)
