"""Multi-process worker for the jax.distributed test (SURVEY.md §4:
multi-host tests "runnable on CPU via jax.distributed + mesh-over-
processes fakes").

Launched by tests/test_multihost.py as N processes, each with 4 virtual
CPU devices; together they form the global ``Mesh(("host", "chip"))`` of
the multi-scene distributed step (parallel/dist_filter.py). Every process
computes the same deterministic problem, provides its addressable shards,
runs the jitted step, and prints its local slice of the per-scene mean
states as JSON lines for the test to reassemble.

Usage: python multihost_worker.py <process_id> <num_processes> <coord>
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dbot_ros_tpu.filters import rbcpf
    from dbot_ros_tpu.models import beam, occlusion, transition
    from dbot_ros_tpu.models.sensor import make_rb_sensor
    from dbot_ros_tpu.ops.raycast import raycast_depth
    from dbot_ros_tpu.parallel import dist_filter
    from dbot_ros_tpu.utils import se3
    from dbot_ros_tpu.utils.camera import make_camera
    from dbot_ros_tpu.utils.mesh import box_mesh

    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    # --- the same deterministic tiny problem on every process
    K = np.array([[28.0, 0, 10], [0, 28.0, 10], [0, 0, 1.0]])
    cam = make_camera(K, 20, 20)
    mesh = box_mesh(0.08, 0.06, 0.05)
    bp = beam.make_beam_params(model_sigma=0.005, sigma_factor=0.0)
    op = occlusion.make_occlusion_params()
    tp = transition.make_transition_params(0.4, 1.5, damping=8.0)
    sensor = make_rb_sensor(mesh, cam, bp, op, tri_chunk=128)

    S, n_part = nproc, 32
    mesh2d = dist_filter.make_scene_mesh(nproc, 4)
    true_poses = jnp.stack([
        jnp.concatenate([jnp.array([0.02 * s - 0.01, 0.0, 0.55 + 0.03 * s]),
                         se3.quat_identity()]) for s in range(S)])
    obs_local = jnp.stack([
        jnp.where(jnp.isfinite(z), z, jnp.nan)
        for z in [raycast_depth(mesh, true_poses[s], cam.rays, 128)
                  for s in range(S)]])

    # local deterministic belief → global sharded arrays
    belief_local = jax.vmap(
        lambda k, p: rbcpf.init_belief(k, p, n_part, cam.num_pixels))(
        jax.random.split(jax.random.PRNGKey(7), S), true_poses[:, None, :])

    def globalize(x, spec):
        xnp = np.asarray(x)
        sh = NamedSharding(mesh2d, spec)
        return jax.make_array_from_callback(
            xnp.shape, sh, lambda idx: xnp[idx])

    sp = P("host", "chip")
    ss = P("host")
    belief = rbcpf.ParticleBelief(
        states=globalize(belief_local.states, sp),
        log_weights=globalize(belief_local.log_weights, sp),
        occlusion=globalize(belief_local.occlusion, sp),
        key=globalize(belief_local.key, ss),
    )
    obs = globalize(obs_local, ss)

    step = dist_filter.make_multi_scene_step(
        mesh2d, sensor, tp, 1.0 / 30.0, max_kl_divergence=0.8)
    for t in range(5):
        belief, mean_states, ess = step(belief, obs)
    jax.block_until_ready(mean_states)

    for shard in mean_states.addressable_shards:
        s0 = shard.index[0].start or 0
        for i, row in enumerate(np.asarray(shard.data)):
            print("MEAN " + json.dumps(
                {"scene": s0 + i, "state": row.reshape(-1).tolist()}),
                flush=True)
    print(f"WORKER_DONE {pid}", flush=True)


if __name__ == "__main__":
    main()
