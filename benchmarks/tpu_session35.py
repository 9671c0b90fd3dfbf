"""TPU experiment 35: attribute the PF step (never/KL) at 10k.

bench r5: never 3.06 ms / KL 4.03 ms. Session-20 traces attributed the
RESAMPLE side; the never-resample floor itself was last traced before
the bf16/compaction rounds. Re-trace both to rank round-6 targets
(lazy lineage vs pre-pass fusion vs kernel)."""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
P = 10_000
cam = default_kinect_camera(8)
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(); op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")
ref = jnp.concatenate([jnp.array([0.0, 0.0, 0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)
print("devices:", jax.devices(), flush=True)
for tag, kl in (("never", 1e9), ("kl", 1.0)):
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                               cam.num_pixels, sensor=sensor)
    step = jax.jit(functools.partial(rbcpf.rbcpf_step, loglik_fn=sensor,
                                     trans_params=tp, dt=1.0/30.0,
                                     max_kl_divergence=kl),
                   donate_argnums=(0,))
    belief, info = step(belief, z_obs)
    jax.block_until_ready(belief)
    t0 = time.perf_counter()
    for _ in range(20):
        belief, info = step(belief, z_obs)
    jax.block_until_ready(belief)
    print(tag, "ms:", (time.perf_counter()-t0)/20*1e3, flush=True)
    tdir = os.path.join(ROOT, "benchmarks", f"session35_trace_{tag}")
    with jax.profiler.trace(tdir):
        for _ in range(5):
            belief, info = step(belief, z_obs)
        jax.block_until_ready(belief)
    print("trace ->", tdir, flush=True)
print("DONE", flush=True)
