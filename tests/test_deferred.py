"""Deferred candidate raycast vs the exact oracle (ref: D12/D13 GPU path)."""

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.ops import deferred, raycast
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import make_camera
from dbot_ros_tpu.utils.mesh import box_mesh, icosphere_mesh, l_shape_mesh


def cam32():
    K = np.array([[48.0, 0, 16], [0, 48.0, 16], [0, 0, 1.0]])
    return make_camera(K, 32, 32)


def base_pose(z=0.6):
    return jnp.concatenate([jnp.array([0.0, 0.0, z]), se3.quat_identity()])


def test_raycast_ids_matches_depth():
    mesh = l_shape_mesh()
    cam = cam32()
    pose = base_pose()
    z_ref = raycast.raycast_depth(mesh, pose, cam.rays, 128)
    z, ids = deferred.raycast_ids(mesh, pose, cam.rays, 128)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-5)
    hit = np.isfinite(np.asarray(z))
    ids = np.asarray(ids)
    assert np.all(ids[hit] >= 0)
    assert np.all(ids[hit] < mesh.num_triangles)
    assert np.all(ids[~hit] == -1)


def test_candidate_ids_structure():
    mesh = l_shape_mesh()
    cam = cam32()
    _, ids = deferred.raycast_ids(mesh, base_pose(), cam.rays, 128)
    cand = deferred.candidate_ids(ids, cam.height, cam.width,
                                  radius=2, num_candidates=4)
    assert cand.shape == (cam.num_pixels, 4)
    # Slot 0 is the pixel's own assignment.
    np.testing.assert_array_equal(np.asarray(cand[:, 0]), np.asarray(ids))
    # Miss pixels adjacent to the silhouette must inherit a valid neighbor.
    ids_img = np.asarray(ids).reshape(cam.height, cam.width)
    cand_img = np.asarray(cand).reshape(cam.height, cam.width, 4)
    near_miss = (ids_img == -1) & (
        np.roll(ids_img, 1, 0) >= 0)  # miss with hit neighbor above
    assert near_miss.any()
    assert (cand_img[near_miss] >= 0).any(axis=-1).all()


def test_deferred_matches_exact_near_reference():
    mesh = l_shape_mesh()
    cam = cam32()
    ref = base_pose()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # particles: few-mm translations + few-degree rotations around ref
    dpos = 0.004 * jax.random.normal(k1, (64, 3))
    drot = 0.02 * jax.random.normal(k2, (64, 3))
    poses = jnp.concatenate(
        [ref[None, :3] + dpos,
         jax.vmap(se3.quat_boxplus, in_axes=(None, 0))(ref[3:7], drot)], -1)

    exact = raycast.raycast_depth(mesh, poses, cam.rays, 128)
    # bary_slack=0: parity test against the exact inside-test (the default
    # slack intentionally trades depth exactness for candidate coverage).
    render = deferred.make_deferred_renderer(
        mesh, cam.rays, cam.height, cam.width, radius=2, num_candidates=4,
        tri_chunk=128, bary_slack=0.0)
    approx = render(ref, poses)
    assert approx.shape == exact.shape

    ex = np.asarray(exact)
    ap = np.asarray(approx)
    hit_agree = np.isfinite(ex) == np.isfinite(ap)
    # Hit/miss agreement on ≥97% of particle-pixels.
    assert hit_agree.mean() > 0.97, hit_agree.mean()
    both = np.isfinite(ex) & np.isfinite(ap)
    # Depth parity where both hit (same or coplanar triangle).
    err = np.abs(ex[both] - ap[both])
    assert np.quantile(err, 0.99) < 5e-3, np.quantile(err, 0.99)
    assert err.max() < 0.12  # worst case bounded (different nearby surface)


def test_deferred_preserves_likelihood_ranking():
    """The deferred depths must rank particle likelihoods like the exact
    renderer (that is all the PF consumes)."""
    from dbot_ros_tpu.models import beam, occlusion
    from dbot_ros_tpu.models.image_loglik import image_loglik
    mesh = l_shape_mesh()
    cam = cam32()
    ref = base_pose()
    true_pose = ref.at[0].add(0.006).at[1].add(-0.004)
    z_true = raycast.raycast_depth(mesh, true_pose, cam.rays, 128)
    z_obs = jnp.where(jnp.isfinite(z_true), z_true, 2.0)

    key = jax.random.PRNGKey(3)
    dpos = 0.008 * jax.random.normal(key, (128, 3))
    poses = jnp.concatenate(
        [ref[None, :3] + dpos,
         jnp.broadcast_to(ref[3:7], (128, 4))], -1)
    bp = beam.make_beam_params(model_sigma=0.005, sigma_factor=0.0)
    op = occlusion.make_occlusion_params()
    occ0 = jnp.full((128, cam.num_pixels), 0.1)

    exact = raycast.raycast_depth(mesh, poses, cam.rays, 128)
    render = deferred.make_deferred_renderer(
        mesh, cam.rays, cam.height, cam.width, tri_chunk=128)
    approx = render(ref, poses)

    ll_e, _ = image_loglik(exact, z_obs, occ0, bp, op)
    ll_a, _ = image_loglik(approx, z_obs, occ0, bp, op)
    corr = np.corrcoef(np.asarray(ll_e), np.asarray(ll_a))[0, 1]
    assert corr > 0.9, corr
    # Rank preservation: the particle the deferred renderer scores best
    # must be among the exact renderer's top particles (silhouette-pixel
    # flips may reorder near-identical particles; what matters to the PF
    # is that high-likelihood regions agree).
    best_a = int(jnp.argmax(ll_a))
    exact_rank = int(jnp.sum(ll_e > ll_e[best_a]))
    assert exact_rank < 13, (exact_rank, corr)  # top 10% of 128


def test_deferred_backend_tracking_parity():
    """System-level validation: the PF with the deferred backend must track
    as well as with the exact backend on the same scene."""
    from dbot_ros_tpu import config as cfg
    from dbot_ros_tpu.runtime import node, sources
    from dbot_ros_tpu.trackers.particle import ParticleTracker

    cam = cam32()
    mesh = l_shape_mesh()
    start = np.array([0, 0, 0.6, 1, 0, 0, 0], np.float32)

    def traj(t):
        p = start.copy()
        p[0] += 0.06 * t / 30.0
        p[2] += 0.02 * t / 30.0
        return p[None]

    rmse = {}
    for backend in ("xla", "deferred"):
        config = cfg.ParticleTrackerConfig(
            evaluation_count=200, max_kl_divergence=0.8, backend=backend,
            observation=cfg.ObservationConfig(model_sigma=0.005,
                                              sigma_factor=0.0),
            transition=cfg.TransitionConfig(0.4, 2.0, damping=4.0),
            seed=3)
        tracker = ParticleTracker(config, meshes=[mesh], camera=cam)
        src = sources.SyntheticSource(mesh, cam, traj, num_frames=10,
                                      noise_sigma=0.003, seed=5)
        rmse[backend] = node.run(tracker, src).position_rmse()
    assert rmse["deferred"] < 0.02, rmse
    assert rmse["deferred"] < rmse["xla"] * 2.5 + 0.005, rmse


def test_deferred_exact_for_reference_pose_itself():
    mesh = box_mesh(0.08, 0.06, 0.05)
    cam = cam32()
    ref = base_pose()
    render = deferred.make_deferred_renderer(
        mesh, cam.rays, cam.height, cam.width, tri_chunk=128,
        bary_slack=0.0)
    approx = render(ref, ref[None])
    exact = raycast.raycast_depth(mesh, ref[None], cam.rays, 128)
    both = np.isfinite(np.asarray(exact))
    np.testing.assert_allclose(np.asarray(approx)[both],
                               np.asarray(exact)[both], atol=1e-4)
    assert (np.isfinite(np.asarray(approx)) == both).all()


def test_deferred_multi_object():
    """Two objects through the deferred backend: min-composition + per-
    object reference passes (ref FreeFloatingRigidBodiesState semantics)."""
    import jax
    from dbot_ros_tpu.filters import rbcpf
    from dbot_ros_tpu.models import beam as bm
    from dbot_ros_tpu.models import occlusion as om
    from dbot_ros_tpu.models import transition as tr
    from dbot_ros_tpu.models.sensor import make_rb_sensor, render_scene

    cam = cam32()
    m1 = box_mesh(0.08, 0.06, 0.05)
    m2 = box_mesh(0.05, 0.05, 0.05)
    bp = bm.make_beam_params(model_sigma=0.005, sigma_factor=0.0)
    op = om.make_occlusion_params()
    tp = tr.make_transition_params(0.3, 1.5, damping=8.0)
    sensor = make_rb_sensor([m1, m2], cam, bp, op, backend="deferred",
                            tri_chunk=128)
    poses0 = jnp.stack([
        jnp.concatenate([jnp.array([-0.05, 0.0, 0.6]),
                         se3.quat_identity()]),
        jnp.concatenate([jnp.array([0.06, 0.0, 0.7]),
                         se3.quat_identity()]),
    ])
    z = render_scene([m1, m2], poses0[None], cam.rays, 128)[0]
    z = jnp.where(jnp.isfinite(z), z, jnp.nan)
    b = rbcpf.init_belief(jax.random.PRNGKey(0), poses0, 64,
                          cam.num_pixels)
    step = jax.jit(lambda bel, obs: rbcpf.rbcpf_step(
        bel, obs, sensor, tp, 1.0 / 30.0, 0.8))
    for t in range(5):
        b, info = step(b, z)
    assert info.mean_state.shape == (2, 13)
    for k in range(2):
        err = float(jnp.linalg.norm(info.mean_state[k, :3] - poses0[k, :3]))
        assert err < 0.01, (k, err)
