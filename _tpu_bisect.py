import sys, time
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.models import beam, occlusion
from dbot_ros_tpu.ops.raycast_pallas import fused_loglik, make_params_vec
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import make_camera
from dbot_ros_tpu.utils.mesh import box_mesh, l_shape_mesh

bp = beam.make_beam_params(model_sigma=0.005, sigma_factor=0.0)
op = occlusion.make_occlusion_params()
pv = make_params_vec(bp, op, jnp.float32(1.0))

def trial(name, mesh, P, hw, K, nb):
    t0 = time.time()
    Km = np.array([[hw*1.5,0,hw//2],[0,hw*1.5,hw//2],[0,0,1.0]])
    cam = make_camera(Km, hw, hw)
    ref = jnp.concatenate([jnp.array([0.,0.,0.6]), se3.quat_identity()])
    poses = jnp.broadcast_to(ref, (P, 7))
    occ0 = jnp.full((P, cam.num_pixels), 0.1)
    z = jnp.full((cam.num_pixels,), 0.57)
    cand = jnp.zeros((cam.num_pixels, K), jnp.int32)
    ll, occ = fused_loglik(mesh, poses, occ0, z, cand, cam.rays, pv, nb=nb, interpret=False)
    ll.block_until_ready()
    print(f"{name}: OK ll[0]={float(ll[0]):.2f} ({time.time()-t0:.1f}s)", flush=True)

print("devices:", jax.devices(), flush=True)
mesh_s = box_mesh(0.08,0.06,0.05)
trial("tiny  P=128 hw=8  K=1 nb=8", mesh_s, 128, 8, 1, 8)
trial("small P=128 hw=16 K=2 nb=8", mesh_s, 128, 16, 2, 8)
trial("med   P=256 hw=32 K=2 nb=64", l_shape_mesh(), 256, 32, 2, 64)
trial("big   P=1024 hw=32 K=2 nb=64", l_shape_mesh(), 1024, 32, 2, 64)
