"""Resampling + weight bookkeeping (ref: fl DiscreteDistribution suite)."""

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.ops import resample as rs


def test_normalize():
    lw = jnp.log(jnp.array([1.0, 2.0, 3.0, 4.0])) + 7.0
    ln, lse = rs.normalize_log_weights(lw)
    np.testing.assert_allclose(jnp.exp(ln), [0.1, 0.2, 0.3, 0.4], atol=1e-6)
    np.testing.assert_allclose(lse, np.log(10.0) + 7.0, rtol=1e-6)


def test_ess_bounds():
    n = 64
    uniform = jnp.zeros((n,))
    np.testing.assert_allclose(rs.effective_sample_size(uniform), n,
                               rtol=1e-5)
    onehot = jnp.full((n,), -100.0).at[3].set(0.0)
    np.testing.assert_allclose(rs.effective_sample_size(onehot), 1.0,
                               rtol=1e-3)


def test_kl_uniform_zero_and_positive():
    np.testing.assert_allclose(rs.kl_to_uniform(jnp.zeros((32,))), 0.0,
                               atol=1e-6)
    onehot = jnp.full((32,), -1e9).at[0].set(0.0)
    np.testing.assert_allclose(rs.kl_to_uniform(onehot), np.log(32),
                               rtol=1e-4)


def test_systematic_degenerate_weights():
    lw = jnp.full((8,), -1e9).at[5].set(0.0)
    idx = rs.systematic_indices(jax.random.PRNGKey(0), lw, 8)
    np.testing.assert_array_equal(idx, np.full(8, 5))


def test_systematic_counts_proportional():
    w = jnp.array([0.1, 0.4, 0.2, 0.3])
    idx = rs.systematic_indices(jax.random.PRNGKey(1), jnp.log(w), 1000)
    counts = np.bincount(np.asarray(idx), minlength=4) / 1000.0
    # systematic resampling error is < 1/M per category
    np.testing.assert_allclose(counts, np.asarray(w), atol=2e-3)


def test_systematic_indices_sorted():
    w = jax.random.uniform(jax.random.PRNGKey(2), (64,))
    idx = rs.systematic_indices(jax.random.PRNGKey(3), jnp.log(w), 64)
    assert bool(jnp.all(jnp.diff(idx) >= 0))


def test_multinomial_counts():
    w = jnp.array([0.5, 0.25, 0.25])
    idx = rs.multinomial_indices(jax.random.PRNGKey(4), jnp.log(w), 4000)
    counts = np.bincount(np.asarray(idx), minlength=3) / 4000.0
    np.testing.assert_allclose(counts, np.asarray(w), atol=0.03)


def _wlg_case(key, R, C, Co, kind):
    """Build (view, par) for one windowed_lane_gather scenario."""
    kv, kp = jax.random.split(jax.random.PRNGKey(key))
    view = jax.random.normal(kv, (R, C), jnp.float32)
    if kind == "sorted":
        par = jnp.sort(jax.random.randint(kp, (Co,), 0, C))
    elif kind == "unsorted":
        par = jax.random.randint(kp, (Co,), 0, C)
    elif kind == "duplicates":
        par = jnp.sort(jax.random.randint(kp, (Co,), 0, 5))
    elif kind == "systematic":
        lw = jax.random.normal(kp, (C,))
        par = rs.systematic_indices(kv, lw, Co)
    elif kind == "span_eq_window":
        # block 0 spans exactly w=256 source lanes
        par = jnp.concatenate([
            jnp.linspace(0, 255, 128).astype(jnp.int32),
            jnp.sort(jax.random.randint(kp, (Co - 128,), 0, C)),
        ])
    elif kind == "span_over_windows":
        # span > max window → jnp.take fallback branch
        par = jnp.concatenate([
            jnp.array([0, C - 1], jnp.int32),
            jnp.sort(jax.random.randint(kp, (Co - 2,), 0, C)),
        ])
    elif kind == "end_clamp":
        # lo near C so starts = C - w clamping branch is exercised
        par = jnp.sort(jax.random.randint(kp, (Co,), C - 40, C))
    elif kind == "global_end":
        # narrow global range at the very end: global-window path with
        # start clamped to C - w
        par = jnp.full((Co,), C - 1, jnp.int32).at[0].set(C - 130)
    elif kind == "global_mid":
        # all parents inside one 300-lane range mid-array (global path,
        # unaligned lo)
        par = jnp.sort(jax.random.randint(kp, (Co,), 333, 633))
    else:
        raise ValueError(kind)
    return view, par.astype(jnp.int32)


def test_windowed_lane_gather_matches_take():
    import pytest
    for kind in ("sorted", "unsorted", "duplicates", "systematic",
                 "span_eq_window", "span_over_windows", "end_clamp",
                 "global_end", "global_mid"):
        view, par = _wlg_case(hash(kind) % 1000, 16, 1024, 256, kind)
        out = jax.jit(rs.windowed_lane_gather)(view, par)
        ref = jnp.take(view, par, axis=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                      err_msg=kind)


def test_windowed_lane_gather_out_of_range_clamps():
    view = jnp.arange(2 * 256, dtype=jnp.float32).reshape(2, 256)
    # Out-of-range ids are clamped up front on BOTH paths (documented;
    # raw jnp.take under jit would wrap negatives / NaN-fill).
    par = jnp.array([-5, 0, 255, 300] + [7] * 124, jnp.int32)
    out = jax.jit(rs.windowed_lane_gather)(view, par)
    ref = jnp.take(view, jnp.clip(par, 0, 255), axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_windowed_lane_gather_sanitize_nonfinite():
    view = jnp.zeros((2, 256), jnp.float32)
    view = view.at[:, 3].set(jnp.nan).at[:, 7].set(jnp.inf)
    view = view.at[:, 11].set(-jnp.inf).at[:, 20].set(2.5)
    par = jnp.sort(jnp.concatenate(
        [jnp.array([3, 7, 11, 20], jnp.int32),
         jnp.arange(124, dtype=jnp.int32) % 256]))
    out = jax.jit(lambda v, p: rs.windowed_lane_gather(v, p,
                                                       sanitize=True))(
        view, par)
    ref = jnp.take(view, par, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # Without sanitize, the matmul fast path poisons the block (this is
    # the documented finiteness precondition — assert it stays documented
    # by asserting the behavior).
    raw = jax.jit(rs.windowed_lane_gather)(view, par)
    assert bool(jnp.any(jnp.isnan(raw)))


def test_fused_sensor_gather_occlusion_windowed_matches_take():
    from dbot_ros_tpu.models import beam, occlusion
    from dbot_ros_tpu.ops import raycast_pallas as rp
    from dbot_ros_tpu.utils.camera import default_kinect_camera
    from dbot_ros_tpu.utils.mesh import icosphere_mesh

    cam = default_kinect_camera(40)
    mesh = icosphere_mesh(radius=0.06, subdivisions=1)
    bp = beam.make_beam_params()
    op = occlusion.make_occlusion_params()
    kw = dict(interpret=True)
    s_win = rp.make_fused_sensor(mesh, cam, bp, op,
                                 lineage_gather="windowed", **kw)
    s_take = rp.make_fused_sensor(mesh, cam, bp, op,
                                  lineage_gather="take", **kw)
    P = 200
    q0 = jax.tree_util.tree_leaves(s_win.init_occlusion(P, 0.1))[0]
    occ = jax.random.uniform(jax.random.PRNGKey(0), q0.shape)
    lw = jax.random.normal(jax.random.PRNGKey(1), (P,))
    parents = rs.systematic_indices(jax.random.PRNGKey(2), lw, P)
    np.testing.assert_array_equal(
        np.asarray(s_win.gather_occlusion(occ, parents)),
        np.asarray(s_take.gather_occlusion(occ, parents)))


def test_resample_pytree_gathers_all_leaves():
    tree = {"a": jnp.arange(6.0), "b": jnp.arange(12.0).reshape(6, 2)}
    idx = jnp.array([5, 0, 0, 3], jnp.int32)
    out = rs.resample_pytree(tree, idx)
    np.testing.assert_array_equal(out["a"], [5, 0, 0, 3])
    np.testing.assert_array_equal(out["b"][0], [10, 11])
    assert out["b"].shape == (4, 2)


def test_sorted_searchsorted_left_matches_jnp():
    for seed in range(5):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        cdf = jnp.sort(jax.random.uniform(k1, (137,)))
        pos = jnp.sort(jax.random.uniform(k2, (211,)))
        ref = jnp.searchsorted(cdf, pos, side="left")
        out = rs.sorted_searchsorted_left(cdf, pos)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # exact ties must follow side='left'
    cdf = jnp.array([0.1, 0.2, 0.2, 0.5, 1.0])
    pos = jnp.array([0.0, 0.1, 0.2, 0.35, 0.5, 1.0])
    np.testing.assert_array_equal(
        np.asarray(rs.sorted_searchsorted_left(cdf, pos)),
        np.asarray(jnp.searchsorted(cdf, pos, side="left")))


def test_sorted_searchsorted_left_unsorted_and_boundary_pos():
    """The blocked-rank form is exact for ANY query order (multinomial
    parents) and for queries beyond either end of the cdf, at sizes
    that are/aren't multiples of the 128 block (padding branch)."""
    for seed, (n, m) in enumerate([(128, 64), (1000, 300), (256, 257),
                                   (10112, 10112), (7, 3)]):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 100))
        cdf = jnp.sort(jax.random.uniform(k1, (n,)))
        pos = jax.random.uniform(k2, (m,)) * 1.2 - 0.1  # spills both ends
        ref = jnp.searchsorted(cdf, pos, side="left")
        out = rs.sorted_searchsorted_left(cdf, pos)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                      err_msg=f"n={n} m={m}")
