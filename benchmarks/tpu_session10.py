"""TPU experiment 10: windowed MXU lineage gather in the full filter step.

Round-1 measurement: rbcpf_step @10k particles = 5.5 ms never-resample /
10.0 ms always-resample — the 4.5 ms delta is entirely the occlusion
lineage lane gather (CLAUDE.md perf notes). This session measures the
windowed_lane_gather replacement end-to-end (composite chained step, the
only timing methodology that is valid through the axon tunnel).
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

print("devices:", jax.devices(), flush=True)

P = 10_000
cam = default_kinect_camera(8)
from dbot_ros_tpu.utils.mesh import icosphere_mesh
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(model_sigma=0.005)
op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
ref = jnp.concatenate([jnp.array([0., 0., 0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)

for gather in ("take", "windowed"):
    sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas",
                            lineage_gather=gather)
    for max_kl, tag in [(1e9, "never-resample"), (-1.0, "always-resample")]:
        belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P,
                                   cam.num_pixels, sensor=sensor)
        step = jax.jit(functools.partial(
            rbcpf.rbcpf_step, loglik_fn=sensor, trans_params=tp,
            dt=1 / 30., max_kl_divergence=max_kl), donate_argnums=(0,))
        belief, info = step(belief, z_obs)
        jax.block_until_ready(info.mean_state)
        t0 = time.perf_counter()
        N_IT = 30
        for _ in range(N_IT):
            belief, info = step(belief, z_obs)
        jax.block_until_ready(info.mean_state)
        dt = (time.perf_counter() - t0) / N_IT
        print(f"{gather:9s} {tag}: {dt*1000:.2f} ms/frame "
              f"({1/dt:.1f} Hz) resampled={bool(info.resampled)}",
              flush=True)
print("DONE", flush=True)
