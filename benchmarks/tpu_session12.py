"""TPU experiment 12: profile the filter step (never + always resample).

Captures jax.profiler traces of the chained composite rbcpf step at the
north star (10k particles, 80x60, icosphere) so per-op device time can
be attributed (parse with benchmarks/parse_trace.py). Two captures:
/tmp/jax-trace-never and /tmp/jax-trace-always.
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh

print("devices:", jax.devices(), flush=True)

P = 10_000
cam = default_kinect_camera(8)
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(model_sigma=0.005)
op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
ref = jnp.concatenate([jnp.array([0., 0., 0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)

sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                        lineage_gather="take")

# sensor-only capture (the bench.py headline path)
occ = sensor.init_occlusion(P, 0.1)
states = jnp.zeros((P, 1, 13), jnp.float32).at[:, 0, :7].set(ref)
sense = jax.jit(lambda s, o, z: sensor(s, o, z, 1.0 / 30.0))
ll, occ2 = sense(states, occ, z_obs)
jax.block_until_ready(ll)
with jax.profiler.trace("/tmp/jax-trace-sensor"):
    o = occ
    for _ in range(5):
        ll, o = sense(states, o, z_obs)
    jax.block_until_ready(ll)
print("sensor: trace written", flush=True)

for max_kl, tag in [(1e9, "never"), (-1.0, "always")]:
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                               cam.num_pixels, sensor=sensor)
    step = jax.jit(functools.partial(
        rbcpf.rbcpf_step, loglik_fn=sensor, trans_params=tp, dt=1 / 30.,
        max_kl_divergence=max_kl), donate_argnums=(0,))
    belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    for _ in range(3):
        belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    logdir = f"/tmp/jax-trace-{tag}"
    with jax.profiler.trace(logdir):
        for _ in range(5):
            belief, info = step(belief, z_obs)
        jax.block_until_ready(info.mean_state)
    print(f"{tag}: trace written to {logdir}", flush=True)
print("DONE", flush=True)
