"""TPU experiment 14: lazy occlusion aging + inverse-map candidates.

Session 11 found the 4.6 ms always-resample overhead was lax.cond branch
copies, not the gather (identity-gather resample: 9.71 ms; take gather
itself: 0.39 ms). rbcpf._maybe_resample now gathers unconditionally with
a where-selected parent vector. Expect always-resample ≈ never-resample
+ ~0.5 ms.
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


def bench(sensor, max_kl, tag):
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                               cam.num_pixels, sensor=sensor)
    step = jax.jit(functools.partial(
        rbcpf.rbcpf_step, loglik_fn=sensor, trans_params=tp, dt=1 / 30.,
        max_kl_divergence=max_kl), donate_argnums=(0,))
    belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    t0 = time.perf_counter()
    for _ in range(30):
        belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    dt = (time.perf_counter() - t0) / 30
    print(f"{tag}: {dt*1000:.2f} ms/frame ({1/dt:.1f} Hz) "
          f"resampled={bool(info.resampled)}", flush=True)


s_take = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                        lineage_gather="take")
bench(s_take, 1e9, "take     never-resample (static skip)")
bench(s_take, -1.0, "take     always-resample")
bench(s_take, 1.0, "take     kl-triggered (1.0)")
s_win = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                       lineage_gather="windowed")
bench(s_win, -1.0, "windowed always-resample")
print("DONE", flush=True)
