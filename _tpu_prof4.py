import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.models import beam, occlusion
from dbot_ros_tpu.ops import deferred
from dbot_ros_tpu.ops.raycast_pallas import (fused_loglik, make_params_vec,
                                             pack_constants, _fused_kernel, _round_up)
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh
from dbot_ros_tpu.ops.raycast import raycast_depth
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
N = cam.num_pixels
p_pad = _round_up(P, 128); pr = p_pad//128
nb = 64; n_pad = _round_up(N, nb)
K = 2
pv = make_params_vec(bp, op, jnp.float32(1.0))

# pixel-major kernel-layout occ state: (n_pad*pr, 128)
occ_k = jnp.full((n_pad*pr, 128), 0.1, jnp.float32)

def step_kernel_layout(poses, occ_k, z):
    _, ids = deferred.raycast_ids(mesh, ref, cam.rays)
    cand = deferred.candidate_ids(ids, cam.height, cam.width, 2, K)
    cand = jnp.where(cand>=0, cand, mesh.padded_triangles-1).astype(jnp.int32)
    gt = pack_constants(mesh, poses, p_pad)
    z_in = jnp.pad(z, (0, n_pad-N), constant_values=jnp.nan)[:, None]
    rays_in = jnp.pad(cam.rays, ((0, n_pad-N),(0,1)))
    cand_in = jnp.pad(cand, ((0, n_pad-N),(0,0)), constant_values=mesh.padded_triangles-1)
    kern = functools.partial(_fused_kernel, nb=nb, pr=pr, K=K)
    occ_out, ll = pl.pallas_call(
        kern, grid=(n_pad//nb,),
        in_specs=[pl.BlockSpec((nb,K), lambda n:(n,0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((nb,1), lambda n:(n,0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((nb,4), lambda n:(n,0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((1,16), lambda n:(0,0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((nb*pr,128), lambda n:(n,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((nb*pr,128), lambda n:(n,0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((pr,128), lambda n:(0,0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad*pr,128), jnp.float32),
                   jax.ShapeDtypeStruct((pr,128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2,K,10*pr,128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,K))],
    )(cand_in, z_in, rays_in, pv.reshape(1,-1), occ_k, gt)
    return ll.reshape(p_pad)[:P], occ_out

step = jax.jit(step_kernel_layout)
ll, occ_k2 = step(poses, occ_k, z_obs); ll.block_until_ready()
t0=time.perf_counter()
o = occ_k
for _ in range(20): ll, o = step(poses, o, z_obs)
ll.block_until_ready()
print(f"kernel-layout feedback: {(time.perf_counter()-t0)/20*1000:.2f} ms", flush=True)
