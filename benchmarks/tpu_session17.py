"""TPU experiment 17: Gaussian tracker (RGF) step latency + headline bench.

The second estimator's perf number at the reference operating point
(80x60 depth, one object; ICRA-2016 runs real-time >= 30 Hz on one CPU
core). Also re-runs bench.py's sensor-only headline at HEAD.
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu import config as cfg
from dbot_ros_tpu.trackers.gaussian import GaussianTracker
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.mesh import icosphere_mesh
from dbot_ros_tpu.utils.camera import default_kinect_camera

print("devices:", jax.devices(), flush=True)

mesh = icosphere_mesh(radius=0.06, subdivisions=3)
cam = default_kinect_camera(8)
ref = jnp.concatenate([jnp.array([0., 0., 0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_img = np.asarray(jnp.where(jnp.isfinite(z_true), z_true, 2.0)).reshape(
    cam.height, cam.width)

for stride in (1, 4):
    config = cfg.GaussianTrackerConfig(pixel_stride=stride)
    tracker = GaussianTracker(config, meshes=[mesh], camera=cam)
    tracker.initialize(np.asarray(ref))
    tracker.track(z_img)  # compile
    t0 = time.perf_counter()
    for _ in range(30):
        poses, info = tracker.track(z_img)
    dt = (time.perf_counter() - t0) / 30
    print(f"rgf stride={stride}: {dt*1e3:.2f} ms/frame ({1/dt:.1f} Hz)",
          flush=True)

# --- bench.py headline, inline (one TPU process at a time) ---
from dbot_ros_tpu.models import beam, occlusion
from dbot_ros_tpu.models.sensor import make_rb_sensor

P = 10_000
bp = beam.make_beam_params()
op = occlusion.make_occlusion_params()
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")
key = jax.random.PRNGKey(0)
dpos = 0.01 * jax.random.normal(key, (P, 3))
states = jnp.zeros((P, 1, 13), jnp.float32)
states = states.at[:, 0, :3].set(ref[:3] + dpos)
states = states.at[:, 0, 3:7].set(ref[3:7])
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)
occ = sensor.init_occlusion(P, 0.1)
step = jax.jit(lambda s, o, z: sensor(s, o, z, 1.0 / 30.0))
ll, occ_new = step(states, occ, z_obs)
jax.block_until_ready(ll)
t0 = time.perf_counter()
for _ in range(20):
    ll, occ = step(states, occ, z_obs)
jax.block_until_ready(ll)
dt = (time.perf_counter() - t0) / 20
print(f"sensor-only: {dt*1e3:.2f} ms -> "
      f"{P*cam.num_pixels/dt/1e9:.2f}e9 evals/s "
      f"({P*cam.num_pixels/dt/1.44e9:.2f}x baseline)", flush=True)
print("DONE", flush=True)
