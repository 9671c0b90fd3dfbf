import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.models import beam, occlusion
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh
from dbot_ros_tpu.ops.raycast import raycast_depth

P = 10_000
cam = default_kinect_camera(8)
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(); op = occlusion.make_occlusion_params()
ref = jnp.concatenate([jnp.array([0.,0.,0.8]), se3.quat_identity()])
k1, _ = jax.random.split(jax.random.PRNGKey(0))
poses = jnp.concatenate([ref[None,:3]+0.01*jax.random.normal(k1,(P,3)),
                         jnp.broadcast_to(ref[3:7],(P,4))],-1)
states = jnp.zeros((P,1,13)).at[:,0,:7].set(poses)
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)

def bench_sensor(tag, **kw):
    sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas", **kw)
    occ = sensor.init_occlusion(P, 0.1)
    step = jax.jit(lambda s,o,z: sensor(s,o,z,1/30.), donate_argnums=(1,))
    ll, o2 = step(states, occ, z_obs); ll.block_until_ready()
    o = jnp.array(o2)
    t0=time.perf_counter()
    for _ in range(20): ll, o = step(states, o, z_obs)
    ll.block_until_ready()
    dt = (time.perf_counter()-t0)/20
    print(f"{tag}: {dt*1000:.2f} ms  ({P*cam.num_pixels/dt/1e9:.2f} Gevals/s)", flush=True)

bench_sensor("nb=64 K=2 (current)", nb=64)
bench_sensor("nb=128 K=2", nb=128)
bench_sensor("nb=192 K=2", nb=192)
bench_sensor("nb=64 K=1", nb=64, num_candidates=1)
bench_sensor("nb=64 K=3", nb=64, num_candidates=3)
