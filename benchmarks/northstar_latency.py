"""North-star #2 benchmark: full RBC-PF filter step latency on one chip.

Target (BASELINE.md): >= 10k particles at 30 Hz (33.3 ms/frame).
Latency history on TPU v5e (never-resample / always-resample, ms —
full trail in docs/DESIGN.md):
  17.7 / 22.4  round 1 baseline
   5.33 / 8.86 round 2 (cached pack matmul, tight ladder, where-select)
   3.66 / 6.62 round 3 session 19 (blocked-rank searchsorted landed)
   2.21 / 5.93 round 3 session 20 (in-place DMA merge scatter)
   2.69 / 3.70 round 3 session 22 (bf16 occlusion storage; KL 3.90)
bench.py now also emits these (full_step field) on every driver run.

Run on TPU hardware: python benchmarks/northstar_latency.py
(compiles take several minutes through a tunnel; run detached).
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import default_kinect_camera
from dbot_ros_tpu.utils.mesh import icosphere_mesh
from dbot_ros_tpu.ops.raycast import raycast_depth

P = 10_000
cam = default_kinect_camera(8)
mesh = icosphere_mesh(radius=0.06, subdivisions=3)
bp = beam.make_beam_params(model_sigma=0.005)
op = occlusion.make_occlusion_params()
tp = transition.make_transition_params(0.1, 0.5, damping=4.0)
sensor = make_rb_sensor(mesh, cam, bp, op, backend="pallas")
ref = jnp.concatenate([jnp.array([0.,0.,0.8]), se3.quat_identity()])
z_true = raycast_depth(mesh, ref, cam.rays)
z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)

for max_kl, tag in [(1e9, "never-resample"), (0.5, "kl-triggered"), (-1.0, "always-resample")]:
    belief = rbcpf.init_belief(jax.random.PRNGKey(0), ref, P, cam.num_pixels, sensor=sensor)
    step = jax.jit(functools.partial(rbcpf.rbcpf_step, loglik_fn=sensor,
                                     trans_params=tp, dt=1/30.,
                                     max_kl_divergence=max_kl),
                   donate_argnums=(0,))
    belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    t0 = time.perf_counter()
    N_IT = 30
    for _ in range(N_IT):
        belief, info = step(belief, z_obs)
    jax.block_until_ready(info.mean_state)
    dt = (time.perf_counter()-t0)/N_IT
    print(f"{tag}: {dt*1000:.2f} ms/frame ({1/dt:.1f} Hz) resampled={bool(info.resampled)}", flush=True)
