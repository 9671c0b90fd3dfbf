import time, functools
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.models import beam, occlusion
from dbot_ros_tpu.ops import deferred
from dbot_ros_tpu.ops.raycast_pallas import fused_loglik, make_params_vec, pack_constants
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
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)
occ0 = jnp.full((P, cam.num_pixels), 0.1)

def timeit(name, f, *args, iters=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return out

p_pad = (P + 127)//128*128

f_ids = jax.jit(lambda r: deferred.raycast_ids(mesh, r, cam.rays))
_, ids = timeit("raycast_ids (ref pass)", f_ids, ref)
f_cand = jax.jit(lambda i: deferred.candidate_ids(i, cam.height, cam.width, 2, 2))
cand = timeit("candidate_ids", f_cand, ids)
cand = jnp.where(cand>=0, cand, mesh.padded_triangles-1).astype(jnp.int32)
f_pack = jax.jit(lambda p: pack_constants(mesh, p, p_pad))
gt = timeit("pack_constants", f_pack, poses)
f_mean = jax.jit(lambda s: se3.states_mean(s))
states13 = jnp.zeros((P,13)).at[:, :7].set(poses)
timeit("states_mean", f_mean, states13)
pv = make_params_vec(bp, op, jnp.float32(1.0))
f_kern = jax.jit(functools.partial(fused_loglik, mesh, nb=64, interpret=False),
                 static_argnames=())
f_kern2 = jax.jit(lambda p_, o_, z_, c_: fused_loglik(mesh, p_, o_, z_, c_, cam.rays, pv, nb=64, interpret=False))
timeit("fused_loglik total (incl pack)", f_kern2, poses, occ0, z_obs, cand)
