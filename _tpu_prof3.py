import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import time
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
occ0 = jnp.full((P, cam.num_pixels), 0.1)
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")
step = jax.jit(lambda s,o,z: sensor(s,o,z,1/30.))

# warmup
ll, occ_new = step(states, occ0, z_obs); ll.block_until_ready()

# A: same-args loop
t0=time.perf_counter()
for _ in range(20): out = step(states, occ0, z_obs)
jax.block_until_ready(out)
print(f"A same-args: {(time.perf_counter()-t0)/20*1000:.2f} ms", flush=True)

# B: feed occ back (bench pattern)
occ = occ0
t0=time.perf_counter()
for _ in range(20): ll, occ = step(states, occ, z_obs)
ll.block_until_ready()
print(f"B occ-feedback: {(time.perf_counter()-t0)/20*1000:.2f} ms", flush=True)

# C: feedback + block every frame (streaming latency)
occ = occ0
t0=time.perf_counter()
for _ in range(20):
    ll, occ = step(states, occ, z_obs); ll.block_until_ready()
print(f"C feedback+block: {(time.perf_counter()-t0)/20*1000:.2f} ms", flush=True)

# D: donated occ buffer
step_don = jax.jit(lambda s,o,z: sensor(s,o,z,1/30.), donate_argnums=(1,))
ll, occ = step_don(states, occ0, z_obs); ll.block_until_ready()
occ = jnp.array(occ)
t0=time.perf_counter()
for _ in range(20): ll, occ = step_don(states, occ, z_obs)
ll.block_until_ready()
print(f"D donated feedback: {(time.perf_counter()-t0)/20*1000:.2f} ms", flush=True)
