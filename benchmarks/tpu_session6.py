"""TPU experiment 6: windowed lineage gather -> resample-path latency."""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.ops import resample as rs

print("devices:", jax.devices(), flush=True)
P = 10_000
cam = default_kinect_camera(8)
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(model_sigma=0.005)
op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
ref = jnp.concatenate([jnp.array([0.,0.,0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")

def timed_loop(name, step, state, iters=30):
    state = step(state); jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt

# gather alone: systematic parents (sorted; window path)
occk = sensor.init_occlusion(P, 0.1)
lw = jnp.asarray(np.random.RandomState(1).randn(P) * 2.0)
idx = rs.systematic_indices(jax.random.PRNGKey(2), lw, P)
timed_loop("occ gather windowed (sorted parents)",
           jax.jit(lambda o: sensor.gather_occlusion(o, idx)), occk)
timed_loop("occ gather general",
           jax.jit(lambda o: sensor.gather_occlusion(o, idx, window=0)),
           occk)

belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                           cam.num_pixels, sensor=sensor)
stepa = jax.jit(functools.partial(rbcpf.rbcpf_step, loglik_fn=sensor,
                                  trans_params=tp, dt=1/30.,
                                  max_kl_divergence=-1.0),
                donate_argnums=(0,))
timed_loop("rbcpf always-resample", lambda b: stepa(b, z_obs)[0], belief)
belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                           cam.num_pixels, sensor=sensor)
stepn = jax.jit(functools.partial(rbcpf.rbcpf_step, loglik_fn=sensor,
                                  trans_params=tp, dt=1/30.,
                                  max_kl_divergence=1e9),
                donate_argnums=(0,))
timed_loop("rbcpf never-resample", lambda b: stepn(b, z_obs)[0], belief)
print("DONE", flush=True)
