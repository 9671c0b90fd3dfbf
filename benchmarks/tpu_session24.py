"""TPU experiment 24: pallas lineage gather, span fix re-measure.

Session 22's lineage_gather='pallas' read 3.86 vs take's 3.70 ms —
but the pad lanes mapped to identity row-groups, blowing the span<=2
check on every ESS-collapse frame, so the MXU routing kernel NEVER ran
and 3.86 was take + dead cond overhead. With pads mapped to the last
real parent (review fix d82a9c1) the fast path engages; re-measure
always/kl against take at HEAD.
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
dt = 1 / 30.


def run_steps(sensor, max_kl, n_steps, label):
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                               cam.num_pixels, sensor=sensor)
    step = jax.jit(functools.partial(
        rbcpf.rbcpf_step, loglik_fn=sensor, trans_params=tp, dt=dt,
        max_kl_divergence=max_kl), donate_argnums=(0,))
    belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)

    def window():
        nonlocal belief, info
        t0 = time.perf_counter()
        for _ in range(n_steps):
            belief, info = step(belief, z_obs)
        # block on the whole belief: mean_state alone under-synchronizes
        # (the 0.07 ms/step artifact this session's first run recorded)
        jax.block_until_ready(belief)
        return (time.perf_counter() - t0) / n_steps

    dtm = min(window() for _ in range(3))
    print(f"{label}: {dtm*1e3:.2f} ms/step", flush=True)
    return dtm


for lg in ("take", "pallas"):
    sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                            lineage_gather=lg)
    run_steps(sensor, -1.0, 30, f"step always {lg}")
    run_steps(sensor, 1.0, 30, f"step kl {lg}")
print("DONE", flush=True)
