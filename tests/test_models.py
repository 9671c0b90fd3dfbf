"""Model-layer tests: occlusion chain, beam densities, transition moments.

Oracles are the closed forms in the papers (Wüthrich IROS13 §IV, Issac
ICRA16) — the golden-value unit tests the reference lacks (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.image_loglik import image_loglik, pixel_likelihoods
from dbot_ros_tpu.utils import se3


# ---------------------------------------------------------------- occlusion

def test_occlusion_one_step_matches_chain():
    p = occlusion.make_occlusion_params(0.1, 0.7, 0.2)
    p0 = jnp.array([0.0, 0.3, 1.0])
    expect = 0.1 * (1 - p0) + 0.7 * p0
    np.testing.assert_allclose(occlusion.propagate(p0, p, 1.0), expect,
                               atol=1e-6)


def test_occlusion_two_steps_compose():
    p = occlusion.make_occlusion_params(0.05, 0.8, 0.2)
    p0 = jnp.array([0.25])
    two = occlusion.propagate(occlusion.propagate(p0, p, 1.0), p, 1.0)
    np.testing.assert_allclose(occlusion.propagate(p0, p, 2.0), two,
                               atol=1e-6)


def test_occlusion_stationary_fixed_point():
    p = occlusion.make_occlusion_params(0.1, 0.7, 0.2)
    pi = occlusion.stationary(p)
    np.testing.assert_allclose(occlusion.propagate(pi, p, 1.0), pi, atol=1e-6)
    # long horizon converges to stationary
    np.testing.assert_allclose(occlusion.propagate(jnp.array([0.99]), p, 500.0),
                               pi, atol=1e-4)


# --------------------------------------------------------------------- beam

def _integrate(f, lo, hi, n=20001):
    z = jnp.linspace(lo, hi, n)
    return jnp.trapezoid(f(z), z)


def test_visible_density_normalizes():
    p = beam.make_beam_params()
    for d in (0.6, 1.5, 4.0):
        total = _integrate(lambda z: beam.density_visible(z, jnp.float32(d), p),
                           0.0, 6.0)
        np.testing.assert_allclose(total, 1.0 - p.p_invalid_visible,
                                   atol=2e-3)


def test_occluded_density_normalizes():
    p = beam.make_beam_params()
    for d in (0.8, 2.0):
        total = _integrate(
            lambda z: beam.density_occluded(z, jnp.float32(d), p), 0.0, 6.0)
        np.testing.assert_allclose(total, 1.0 - p.p_invalid_occluded,
                                   atol=2e-3)


def test_background_density_normalizes():
    p = beam.make_beam_params()
    total = _integrate(lambda z: beam.density_background(z, p), 0.0, 6.0)
    np.testing.assert_allclose(total, 1.0 - p.p_invalid_background, atol=2e-3)


def test_visible_density_peaks_at_prediction():
    p = beam.make_beam_params()
    d = jnp.float32(1.0)
    z = jnp.linspace(0.5, 1.5, 1001)
    dens = beam.density_visible(z, d, p)
    assert abs(float(z[jnp.argmax(dens)]) - 1.0) < 2e-3


def test_occluded_density_in_front_only():
    p = beam.make_beam_params(tail_weight=0.0)
    d = jnp.float32(1.0)
    assert float(beam.density_occluded(jnp.float32(0.7), d, p)) > 0.0
    assert float(beam.density_occluded(jnp.float32(1.3), d, p)) == 0.0


def test_occlusion_posterior_direction():
    bp = beam.make_beam_params()
    prior = jnp.float32(0.3)
    d = jnp.float32(1.0)
    # Measurement well in front of prediction → more likely occluded.
    _, post_front = pixel_likelihoods(d, jnp.float32(0.6), prior, bp)
    # Measurement right at prediction → more likely visible.
    _, post_at = pixel_likelihoods(d, jnp.float32(1.0), prior, bp)
    assert float(post_front) > 0.6
    assert float(post_at) < 0.1


def test_image_loglik_prefers_true_pose_depth():
    bp = beam.make_beam_params()
    op = occlusion.make_occlusion_params()
    n = 64
    z = jnp.full((n,), 1.0)
    occ0 = jnp.full((2, n), 0.05)
    depth_good = jnp.full((2, n), 1.0).at[1].set(1.2)  # particle 1 is off
    ll, occ_post = image_loglik(depth_good, z, occ0, bp, op)
    assert ll.shape == (2,)
    assert float(ll[0]) > float(ll[1])
    assert occ_post.shape == (2, n)


def test_image_loglik_invalid_and_miss_pixels():
    bp = beam.make_beam_params()
    op = occlusion.make_occlusion_params()
    z = jnp.array([jnp.nan, 1.0, 2.0])
    depth = jnp.array([[1.0, jnp.inf, 2.0]])
    occ0 = jnp.full((1, 3), 0.1)
    ll, occ_post = image_loglik(depth, z, occ0, bp, op)
    assert bool(jnp.isfinite(ll[0]))
    assert bool(jnp.all(jnp.isfinite(occ_post)))
    assert bool(jnp.all((occ_post >= 0) & (occ_post <= 1)))


# --------------------------------------------------------------- transition

def test_transition_mean_damping_and_integration():
    p = transition.make_transition_params(damping=2.0)
    s = se3.state_identity()
    s = s.at[7:10].set(jnp.array([1.0, 0.0, 0.0]))  # v_x = 1 m/s
    dt = 0.1
    m = transition.transition_mean(s, dt, p)
    a = np.exp(-2.0 * dt)
    abar = (1 - a) / (2.0 * dt)
    np.testing.assert_allclose(m[7], a, atol=1e-5)           # damped velocity
    np.testing.assert_allclose(m[0], dt * abar, atol=1e-5)   # integrated pos


def test_transition_mean_rotates():
    p = transition.make_transition_params(damping=0.0)
    s = se3.state_identity()
    s = s.at[10:13].set(jnp.array([0.0, 0.0, np.pi]))  # ω_z = π rad/s
    m = transition.transition_mean(s, 0.5, p)
    # After 0.5 s: 90° about z.
    v = se3.quat_rotate(m[3:7], jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-5)


def test_transition_noise_moments():
    p = transition.make_transition_params(
        linear_acceleration_sigma=0.5, angular_acceleration_sigma=0.3,
        damping=0.0)
    n, dt = 20000, 0.2
    s = jnp.broadcast_to(se3.state_identity(), (n, 13))
    out = transition.sample_transition(jax.random.PRNGKey(0), s, dt, p)
    dx = np.asarray(out[:, 0])          # x displacement
    dv = np.asarray(out[:, 7])          # v_x change
    Q = transition.process_noise_cov(dt, p)
    np.testing.assert_allclose(dx.var(), float(Q[0, 0]), rtol=0.06)
    np.testing.assert_allclose(dv.var(), float(Q[6, 6]), rtol=0.06)
    np.testing.assert_allclose(np.cov(dx, dv)[0, 1], float(Q[0, 6]),
                               rtol=0.1)
    # angular block
    dth = np.asarray(se3.so3_log(out[:, 3:7]))[:, 2]
    np.testing.assert_allclose(dth.var(), float(Q[5, 5]), rtol=0.08)


def test_process_noise_cov_psd():
    p = transition.make_transition_params()
    Q = transition.process_noise_cov(1.0 / 30.0, p)
    eig = np.linalg.eigvalsh(np.asarray(Q, np.float64))
    assert eig.min() >= -1e-12
