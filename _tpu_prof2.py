import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import time, functools
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.models import beam, occlusion
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.ops import deferred
from dbot_ros_tpu.ops.raycast_pallas import fused_loglik, make_params_vec
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
pv = make_params_vec(bp, op, jnp.float32(1.0))

def timeit(name, f, *args, iters=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms", flush=True)

# A: full sensor (as bench)
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")
fA = jax.jit(lambda s,o,z: sensor(s,o,z,1/30.))
timeit("A full sensor", fA, states, occ0, z_obs)

# B: sensor body with FIXED ref (no states_mean) 
def sensorB(states, occ, z):
    poses = states[...,0,:7]
    _, ids = deferred.raycast_ids(mesh, ref, cam.rays)
    cand = deferred.candidate_ids(ids, cam.height, cam.width, 2, 2)
    cand = jnp.where(cand>=0, cand, mesh.padded_triangles-1).astype(jnp.int32)
    return fused_loglik(mesh, poses, occ, z, cand, cam.rays, pv, nb=64)
fB = jax.jit(sensorB)
timeit("B fixed-ref sensor", fB, states, occ0, z_obs)

# C: B + states_mean added back but result unused except ref
def sensorC(states, occ, z):
    poses = states[...,0,:7]
    r = se3.states_mean(states[:,0])[:7]
    _, ids = deferred.raycast_ids(mesh, r, cam.rays)
    cand = deferred.candidate_ids(ids, cam.height, cam.width, 2, 2)
    cand = jnp.where(cand>=0, cand, mesh.padded_triangles-1).astype(jnp.int32)
    return fused_loglik(mesh, poses, occ, z, cand, cam.rays, pv, nb=64)
fC = jax.jit(sensorC)
timeit("C mean-ref sensor", fC, states, occ0, z_obs)
