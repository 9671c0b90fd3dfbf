"""TPU experiment 34: attribute the GF step's ~18 ms non-render floor.

Session 32 showed the deferred sigma backend removes the render cost
(icosphere 276.7 -> 21.0 ms) but an ~18 ms floor remains on BOTH
backends at l_shape, and scene-batching does not amortize it (real
per-scene compute, not dispatch). Trace the deferred l_shape step and
print the per-op table (benchmarks/parse_trace.py).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.filters import rgf
from dbot_ros_tpu.models import beam as bm
from dbot_ros_tpu.models import occlusion as om
from dbot_ros_tpu.models import transition
from dbot_ros_tpu.ops.deferred import make_sigma_renderer
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import l_shape_mesh

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print("devices:", jax.devices(), flush=True)

cam = default_kinect_camera(8)
mesh = l_shape_mesh()
bp = bm.make_beam_params(model_sigma=0.005, sigma_factor=0.0)
op = om.make_occlusion_params()
tp = transition.make_transition_params(0.4, 2.5, damping=6.0)
pose = jnp.concatenate([jnp.array([0.0, 0.0, 0.55]), se3.quat_identity()])
d = raycast_depth(mesh, pose, cam.rays, 128)
z = jnp.where(jnp.isfinite(d), d, 2.0)
render_fn = make_sigma_renderer([mesh], cam.rays, cam.height, cam.width)
step = jax.jit(functools.partial(
    rgf.rgf_step, render_fn=render_fn, trans_params=tp, dt=1.0 / 30.0,
    bp=bp, iterations=6, trust_sigma=1.5, occ_params=op),
    donate_argnums=(0,))
belief = rgf.init_belief(jax.random.PRNGKey(0), pose,
                         num_pixels=cam.num_pixels, first_frame=z,
                         initial_occlusion_prob=0.1)
belief, info = step(belief, z)
jax.block_until_ready((belief, info))
t0 = time.perf_counter()
for _ in range(20):
    belief, info = step(belief, z)
jax.block_until_ready((belief, info))
print("chained ms:", (time.perf_counter() - t0) / 20 * 1e3, flush=True)

tdir = os.path.join(ROOT, "benchmarks", "session34_trace")
with jax.profiler.trace(tdir):
    for _ in range(5):
        belief, info = step(belief, z)
    jax.block_until_ready((belief, info))
print("trace ->", tdir, flush=True)
print("DONE", flush=True)
