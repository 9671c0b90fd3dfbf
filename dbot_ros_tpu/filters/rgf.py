"""Robust multi-sensor Gaussian filter on SE(3) (the second estimator).

Replaces the fl Gaussian-filter stack the reference's Gaussian tracker is
built from (F2–F5: ``gaussian_filter_nonlinear.hpp``,
``multi_sensor_gaussian_filter.hpp``, ``robust_multi_sensor_gaussian_
filter.hpp``; Issac et al., ICRA 2016): every (downsampled) depth pixel is
an independent scalar sensor; the update is a sigma-point statistical
linearization with per-pixel body-tail robustification.

TPU-first redesign of the update (SURVEY.md P2): instead of the reference's
*sequential* per-pixel scalar updates, one **joint information-form update**
over all pixels — a handful of MXU matmuls + one 12×12 solve instead of
4800 dependent scalar steps:

    Λ' = P⁻¹ + Σ_c H_cᵀ diag(1/R̂_c) H_c     (channels c; H = P_xyᵀ P_lin⁻¹)
    δμ = Λ'⁻¹ Σ_c H_cᵀ diag(1/R̂_c) ν_c      (iterated, trust-region-clipped)

Structural upgrades over a naive sigma-point GF (each one fixes a failure
mode observed on synthetic scenes — see the update() docstring):
  1. Two measurement channels per pixel: hit-conditional surface *depth*
     and the *silhouette* (hit-indicator) — keeps lateral pose observable.
  2. A learned per-pixel background depth map closes the generative model:
     each observed depth is assigned to {object, background, occluder,
     clutter}; responsibilities weight the channels (an occluder-explained
     pixel informs neither — the GF analog of the PF's occlusion chain).
  3. Linearization-spread floor: sigma points are spread at least ~1 pixel
     so silhouette gradients survive belief contraction.
  4. Iterated (IPLF-style) update with trust-region steps, since the
     render is discontinuous in the pose.
  5. Temporal occlusion memory (default on via the tracker config): the
     per-pixel clutter-component prior is a D10-style occlusion chain
     over the pixel's own responsibility history instead of a flat
     tail weight — the GF-side analog of the PF's Rao-Blackwellized
     occlusion state. Measured: eliminates the occluder-crossing drift
     and rotation lock-in (EVAL.md occluder note).

The render path is shared with the particle filter: the 25 sigma states are
just a tiny particle batch through ops/raycast (the reference's D5 sharing).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dbot_ros_tpu.models import beam as beam_mod
from dbot_ros_tpu.models.transition import (TransitionParams,
                                            process_noise_cov,
                                            transition_mean)
from dbot_ros_tpu.ops import sigma_points as sp
from dbot_ros_tpu.utils import se3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianBelief:
    """Gaussian belief: mean state (13,) + tangent covariance (12, 12).

    ``background`` is a per-pixel scene-depth estimate (N,) learned online
    from pixels the object does not cover. Sigma points whose ray misses
    the object predict the *background* depth — which makes silhouette
    edges smoothly observable to the statistical linearization (both
    "object should cover this pixel" and "object should not") instead of
    being discontinuities the robust weighting has to reject. The
    reference GF has no such term and is correspondingly weaker laterally;
    this is a TPU-cheap structural improvement, not extra cost per step.
    """

    mean: jax.Array
    cov: jax.Array
    background: jax.Array
    key: jax.Array  # kept for API symmetry with ParticleBelief
    # Optional per-pixel occlusion-probability memory (the D10 chain for
    # the GF, opt-in): None = the instantaneous per-frame mixture only.
    occ_prior: Optional[jax.Array] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RgfStepInfo:
    mean_state: jax.Array     # (13,)
    mean_beta: jax.Array      # average body responsibility (inlier rate)
    innovation_rms: jax.Array  # RMS depth innovation over inlier pixels
    # per-frame observation log-marginal Σ_px log p(y_px | belief) at the
    # converged mean — the evidence the multi-hypothesis trial races
    # (near-symmetric flips tie on inlier RATE but separate on the
    # accumulated marginal; VERDICT r4 item 4)
    obs_loglik: jax.Array


def init_belief(key, initial_pose, num_pixels: int = 0, first_frame=None,
                pos_sigma=0.02, rot_sigma=0.1, vel_sigma=0.1,
                background_depth=5.0,
                initial_occlusion_prob=None) -> GaussianBelief:
    """Gaussian init around the given pose(s) (ref: GaussianTracker init).

    ``initial_pose`` (7,) → single-object belief (mean (13,), cov 12×12);
    (K, 7) → scene belief (mean (K, 13), joint block-diagonal cov).

    The background map starts from ``first_frame`` where valid (a depth
    frame taken at/before initialization), else at ``background_depth``;
    it keeps learning online during tracking.
    """
    initial_pose = jnp.asarray(initial_pose, jnp.float32)
    K = initial_pose.shape[0] if initial_pose.ndim == 2 else 1
    mean = jnp.zeros(initial_pose.shape[:-1] + (13,),
                     jnp.float32).at[..., :7].set(initial_pose)
    diag = jnp.tile(jnp.concatenate([
        jnp.full((3,), pos_sigma ** 2), jnp.full((3,), rot_sigma ** 2),
        jnp.full((6,), vel_sigma ** 2)]), K).astype(jnp.float32)
    if first_frame is not None:
        bg = jnp.where(jnp.isfinite(first_frame), first_frame,
                       jnp.float32(background_depth))
    else:
        bg = jnp.full((num_pixels,), jnp.float32(background_depth))
    occ_prior = (None if initial_occlusion_prob is None else
                 jnp.full_like(bg, jnp.float32(initial_occlusion_prob)))
    return GaussianBelief(mean=mean, cov=jnp.diag(diag), background=bg,
                          key=key, occ_prior=occ_prior)


def _scene_mean(mean):
    """Normalize (13,) | (K, 13) → ((K, 13), was_single)."""
    single = mean.ndim == 1
    return (mean[None] if single else mean), single


def predict(belief: GaussianBelief, dt, params: TransitionParams,
            ut=None) -> GaussianBelief:
    """UKF prediction through the damped-Wiener dynamics.

    Works on single-object beliefs (mean (13,), cov 12×12) and K-object
    scene beliefs (mean (K, 13), cov 12K×12K — joint tangent space;
    process noise is block-diagonal per object)."""
    ut = ut or sp.default_ut_params()
    mean0, single = _scene_mean(belief.mean)
    K = mean0.shape[0]
    states, _, wm, wc = sp.scene_sigma_points(mean0, belief.cov, **ut)
    prop = transition_mean(states, dt, params)
    mean, cov, _ = sp.scene_reconstruct_moments(prop, prop[0], wm, wc)
    Q = process_noise_cov(dt, params, cov.dtype)
    cov = cov + (Q if K == 1 else
                 jnp.kron(jnp.eye(K, dtype=cov.dtype), Q))
    return GaussianBelief(mean=mean[0] if single else mean, cov=cov,
                          background=belief.background, key=belief.key,
                          occ_prior=belief.occ_prior)


def _gauss(y, m, var):
    var = jnp.maximum(var, 1e-12)
    d = y - m
    return jnp.exp(-0.5 * d * d / var) / jnp.sqrt(2.0 * jnp.pi * var)


def _occluder_tail(y, front, bp):
    """Clutter density: uniform + truncated-exponential in front of the
    expected scene surface (same shape as the PF beam model's occluded
    branch, models/beam.py density_occluded)."""
    uniform = 1.0 / (bp.max_depth - bp.min_depth)
    lam = bp.exponential_rate
    span = jnp.maximum(
        jnp.clip(front, bp.min_depth, bp.max_depth) - bp.min_depth, 1e-6)
    norm = jnp.maximum(1.0 - jnp.exp(-lam * span), 1e-6)
    in_front = (y >= bp.min_depth) & (y <= front)
    exp_dens = jnp.where(
        in_front, lam * jnp.exp(-lam * (y - bp.min_depth)) / norm, 0.0)
    return 0.5 * uniform + 0.5 * exp_dens


def update(belief: GaussianBelief, z_obs, render_fn,
           bp: beam_mod.BeamParams, ut=None, iterations: int = 3,
           trust_sigma: float = 1.0, lin_floor_pos: float = 0.008,
           lin_floor_rot: float = 0.04, lin_cap_pos: float = 0.04,
           lin_cap_rot: float = 0.25, bg_sigma: float = 0.02,
           invalid_discount: float = 0.25, occ_params=None,
           occ_dt_frames: float = 1.0, learn_world: bool = True):
    """Robust multi-sensor measurement update (see module docstring).

    Design notes, each grounded in a failure mode this replaces:
    * Folding misses into the depth moments (as max_depth or as the
      background) poisons the linearization — mostly-miss pixels observing
      the scene look like huge inliers, or every background pixel exerts a
      phantom-mass tug that biases the pose under asymmetric occlusion.
      Hence depth moments are *hit-conditional* and silhouette information
      flows through its own indicator channel.
    * An occluder explains measurements in front of the expected surface;
      such pixels get r_obj ≈ r_bg ≈ 0 and inform neither channel, so a
      transient occluder neither drags the pose nor poisons the
      background map (which also learns slowly, EMA 0.2).

    Args:
      render_fn: poses (S, 7) → predicted depths (S, N) for single-object
        beliefs; poses (S, K, 7) → (S, N) (min over objects) for scene
        beliefs; inf = miss.
    """
    ut = ut or sp.default_ut_params()
    mean0, single = _scene_mean(belief.mean)
    K = mean0.shape[0]
    D = 12 * K
    P = belief.cov + 1e-10 * jnp.eye(D, dtype=belief.cov.dtype)
    P_inv = jnp.linalg.inv(P)

    # Linearization-spread CAP (the upper twin of the floor below): a
    # dt-aware prediction over a long frame gap inflates P far past the
    # object's pixel footprint, and a statistical linearization probed
    # over tens of centimeters is meaningless — sigma renders mostly
    # miss, the silhouette moments are garbage, and one trust step of
    # sqrt(diag P) then jumps the mean by the full inflated sigma
    # (measured: the dt-aware GF DIVERGED on a 16-frame blackout while
    # the pinned-dt control recovered). Cap the PROBE (and with it the
    # per-step trust radius) at lin_cap_*; reach beyond the cap comes
    # from the iterated re-renders, each re-centered at the running
    # mean — iterations × cap of well-linearized travel per frame.
    # The belief covariance itself is NOT capped (uncertainty stays
    # honest); only the probe/step geometry is. Diagonal scaling
    # S P S keeps the probe PSD and shrinks cross terms consistently.
    cap_vec = jnp.concatenate([
        jnp.full((3,), lin_cap_pos), jnp.full((3,), lin_cap_rot),
        jnp.full((6,), jnp.inf)])
    cap_full = jnp.tile(cap_vec, K).astype(P.dtype)
    scale = jnp.minimum(1.0, cap_full
                        / jnp.maximum(jnp.sqrt(jnp.diagonal(P)), 1e-12))
    P_probe = P * scale[:, None] * scale[None, :]
    step_cap = trust_sigma * jnp.sqrt(jnp.diagonal(P_probe))
    bg = belief.background
    bg_sigma_sq = jnp.float32(bg_sigma) ** 2

    # Optional temporal occlusion memory (the D10 chain for the GF):
    # the per-pixel clutter/occluder component prior becomes the
    # chain-propagated occlusion probability instead of the flat
    # tail_weight — a pixel recently explained by an occluder stays
    # suspicious, one recently surface-explained takes more evidence to
    # write off. With occ_prior None (default) w_c is the scalar
    # tail_weight and behavior is bit-identical to the memoryless GF.
    if belief.occ_prior is not None and occ_params is not None:
        from dbot_ros_tpu.models import occlusion as occ_mod
        # one frame interval at the tracker's nominal rate; pass the
        # true dt·frame_rate when frames are dropped (PF sensors do
        # the same conversion, raycast_pallas dtf)
        occ_pred = occ_mod.propagate(belief.occ_prior, occ_params,
                                     occ_dt_frames)
        w_c = jnp.clip(occ_pred, bp.tail_weight, 0.95)
    else:
        occ_pred = None
        w_c = bp.tail_weight

    # Linearization spread floor: once the belief contracts below one
    # pixel's metric size, all sigma points agree on every pixel and the
    # silhouette gradient vanishes — the filter goes blind laterally and
    # drifts (velocity feedback turns that into a runaway). Widening only
    # the *linearization* covariance (never the belief) keeps edges
    # observable at sub-pixel convergence; H stays a valid linearization,
    # just computed over a wider probe region.
    #
    # The floor ANNEALS with the belief (VERDICT r3 item 4): a wide probe
    # is a smoothing kernel over the discontinuous render, so holding it
    # at the configured maximum after convergence biases the
    # linearization by the probe width (measured ~2× the PF's rot RMSE
    # on nominal). Track ~1.5× the current marginal std per block,
    # clamped to [¼·floor, floor] — wide while uncertain (init,
    # occlusion recovery), tight once converged, never fully closed
    # (silhouette observability needs a minimum probe).
    diagP = jnp.diagonal(P_probe).reshape(K, 12)
    pos_std = jnp.sqrt(jnp.mean(diagP[:, 0:3], axis=-1))
    rot_std = jnp.sqrt(jnp.mean(diagP[:, 3:6], axis=-1))
    fp = jnp.clip(1.5 * pos_std, 0.25 * lin_floor_pos, lin_floor_pos)
    fr = jnp.clip(1.5 * rot_std, 0.25 * lin_floor_rot, lin_floor_rot)
    floor = jnp.concatenate([
        jnp.concatenate([jnp.full((3,), fp[k] ** 2),
                         jnp.full((3,), fr[k] ** 2),
                         jnp.zeros((6,))]) for k in range(K)
    ]).astype(P.dtype)

    P_lin = P_probe + jnp.diag(floor)

    def linearize(mean):
        """Two measurement channels per pixel from one sigma-point render.

        Depth channel: the object's surface depth, conditional on the ray
        hitting the object (moments over hit sigma points only).
        Silhouette channel: the hit indicator itself — `p_hit(x)` is a
        smooth function of the pose over the sigma spread, so silhouette
        edges give symmetric grow/shrink information.

        A per-pixel generative mixture assigns the observed depth to
        {object body, background, occluder, clutter}; the responsibilities
        weight the channels: an occluder-explained pixel informs neither
        (the object may or may not be behind it) — exactly the latent
        occlusion semantics the PF gets from its occlusion chain (D10).
        """
        states, deltas, wm, wc = sp.scene_sigma_points(mean, P_lin, **ut)
        poses = states[:, 0, :7] if single else states[..., :7]
        Y_raw = render_fn(poses)                        # (S, N)
        hit = jnp.isfinite(Y_raw)
        hitf = hit.astype(jnp.float32)
        Y = jnp.where(hit, Y_raw, 0.0)

        # --- hit-conditional depth moments
        wm_hit = wm[:, None] * hitf                     # (S, N)
        p_hit = jnp.sum(wm_hit, axis=0)                 # (N,)
        safe_p = jnp.maximum(p_hit, 1e-6)
        m = jnp.sum(wm_hit * Y, axis=0) / safe_p
        Yc = jnp.where(hit, Y - m[None, :], 0.0)
        s_yy = jnp.sum(wm_hit * Yc * Yc, axis=0) / safe_p
        Pxy_d = jnp.einsum("sn,st,sn->tn", wm_hit, deltas, Yc,
                           precision=jax.lax.Precision.HIGHEST) / safe_p

        # --- silhouette (hit-indicator) moments
        hc = hitf - p_hit[None, :]
        Pxy_s = jnp.einsum("s,st,sn->tn", wm, deltas, hc,
                           precision=jax.lax.Precision.HIGHEST)

        # --- generative mixture responsibilities at the observed depth.
        # Valid pixels: {object body, learned background, occluder/clutter}
        # densities. Invalid pixels (NaN/miss/out-of-range) use the beam
        # model's invalid point masses (D9, beam.mass_invalid): a miss is
        # *informative* — P(invalid | visible) ≪ P(invalid | off-object) —
        # so a pixel where the belief predicts object but the sensor sees
        # nothing exerts a silhouette *shrink* force. Without this branch
        # the silhouette channel is grow-only (observed-object pixels pull
        # "cover me", empty-space pixels say nothing) and a partial
        # occluder drags the estimate onto the visible fragment — the
        # occluder-divergence failure the r2 eval recorded.
        R = beam_mod.depth_sigma(m, bp) ** 2
        valid = jnp.isfinite(z_obs) & (z_obs >= bp.min_depth) \
            & (z_obs <= bp.max_depth)
        y = jnp.where(valid, z_obs, 1.0)
        # Invalid-branch masses carry the same (1 - tail_weight)
        # component prior as the valid-branch densities — without it the
        # mixture is inconsistent across branches and invalid-pixel
        # responsibilities skew ~2 % toward obj/bg (advisor r3).
        c_obj = jnp.where(
            valid,
            p_hit * (1.0 - w_c) * _gauss(y, m, s_yy + R),
            p_hit * (1.0 - w_c) * bp.p_invalid_visible)
        c_bg = jnp.where(
            valid,
            (1.0 - p_hit) * (1.0 - w_c)
            * _gauss(y, bg, bg_sigma_sq + R),
            (1.0 - p_hit) * (1.0 - w_c)
            * bp.p_invalid_background)
        front = p_hit * m + (1.0 - p_hit) * bg
        c_clut = jnp.where(
            valid,
            w_c * _occluder_tail(y, front, bp),
            w_c * bp.p_invalid_occluded)
        total = jnp.maximum(c_obj + c_bg + c_clut, 1e-30)
        obs_ll = jnp.sum(jnp.log(total))
        r_obj = c_obj / total
        r_bg = c_bg / total

        # --- depth channel
        H_d = jnp.linalg.solve(P_lin, Pxy_d).T          # (N, 12)
        expl_d = jnp.einsum("nt,tn->n", H_d, Pxy_d)
        U_d = jnp.maximum(s_yy - expl_d, 0.0)
        # depth is only measured on valid returns (invalid pixels carry
        # silhouette information only)
        iR_d = jnp.where(valid, r_obj, 0.0) / (R + U_d + 1e-12)
        innov_d = jnp.where(valid, y - m, 0.0)

        # --- silhouette channel: observed foreground fraction vs p_hit.
        # Invalid pixels participate: their o_obs comes from the invalid
        # point-mass responsibilities (≈ 0 where the object is predicted
        # but nothing is seen — the shrink force; exactly 0 innovation at
        # p_hit∈{0,1} interior pixels, so dropout bursts on the object
        # body stay harmless).
        H_s = jnp.linalg.solve(P_lin, Pxy_s).T          # (N, 12)
        o_obs = r_obj / jnp.maximum(r_obj + r_bg, 1e-6)
        var_s = p_hit * (1.0 - p_hit) + 0.05
        # Invalid (empty-space) pixels are spatially correlated — a miss
        # region is one surface absence, not N independent detections —
        # so their silhouette information is tempered (inflated R), the
        # standard correlated-measurement robustification. The discount
        # additionally scales with the frame's valid fraction: a mostly-
        # invalid frame signals sensor failure (correlated blackout), not
        # object absence, so an all-invalid frame contributes exactly
        # zero information and the filter coasts.
        valid_frac = jnp.mean(valid.astype(jnp.float32))
        iR_s = jnp.where(valid, 1.0, invalid_discount * valid_frac) \
            * (r_obj + r_bg) / var_s
        innov_s = o_obs - p_hit

        return ((H_d, iR_d, innov_d), (H_s, iR_s, innov_s),
                r_obj, r_bg, p_hit, valid, obs_ll)

    def information(channels):
        Lam = P_inv
        rhs = jnp.zeros((D,), P.dtype)
        for H, iR, innov in channels:
            Ht_iR = H.T * iR[None, :]                   # (12, N)
            Lam = Lam + Ht_iR @ H
            rhs = rhs + Ht_iR @ innov
        return 0.5 * (Lam + Lam.T), rhs

    # Iterated statistically-linearized update (IPLF-style): re-render at
    # the running mean; each tangent step is trust-region-clipped to the
    # prior sigma ellipsoid (the linearization is meaningless beyond the
    # sigma-point spread — the measurement is discontinuous in the pose).
    # The *cumulative* displacement from the prior mean is also clipped,
    # with a support-gated radius: when the object is well observed
    # (inlier fraction ≈ 1) all `iterations` steps may compound — fast
    # dynamics legitimately need multi-sigma catch-up across the
    # discontinuous render — but when the linearization rests on a
    # handful of inlier pixels (heavy occlusion) the radius contracts to
    # one trust step, so a noisy fragment cannot drag the mean
    # iterations×trust_sigma sigmas in one frame (the runaway that
    # preceded the r2 occluder divergence).
    mean = mean0
    chans = r_obj = r_bg = p_hit = valid_px = obs_ll = None
    for _ in range(iterations):
        (chan_d, chan_s, r_obj, r_bg, p_hit, valid_px,
         obs_ll) = linearize(mean)
        chans = (chan_d, chan_s)
        on_obj_f = (p_hit > 0.5).astype(jnp.float32)
        # Gate on *occluder evidence*, not raw inlier rate: a fast-motion
        # catch-up frame has misaligned pixels explained by the learned
        # background (r_bg high, r_clut ≈ 0 — the linearization direction
        # is trustworthy, keep the full radius), while a partially
        # occluded frame has predicted-object pixels explained by the
        # occluder tail (r_clut high — the visible fragment's pull is
        # biased, contract to ~1 trust step). Raw support cannot separate
        # the two regimes (both sit at ≈0.3–0.6, measured probes).
        r_clut = 1.0 - r_obj - r_bg
        occ_frac = jnp.sum(r_clut * on_obj_f) / jnp.maximum(
            jnp.sum(on_obj_f), 1.0)
        gate = (1.0 - occ_frac) ** 2
        total_cap = step_cap * (1.0 + (iterations - 1.0) * gate)
        Lam, rhs = information(chans)
        # Gauss-Newton step around the current mean: account for the
        # displacement already taken from the prior mean.
        d0 = se3.state_boxminus(mean, mean0).reshape(-1)
        delta = jnp.linalg.solve(Lam, rhs - P_inv @ d0)
        delta = jnp.clip(delta, -step_cap, step_cap)
        # Take the plain GN iterate (retraction from the *current* mean —
        # re-retracting every step from mean0 with a summed tangent walks
        # a different SO(3) path and biases large rotations); only when
        # the cumulative displacement exceeds the gated radius, pull the
        # iterate back onto the trust boundary around the prior mean.
        cand = se3.state_boxplus(mean, delta.reshape(K, 12))
        d_tot = se3.state_boxminus(cand, mean0).reshape(-1)
        exceeded = jnp.any(jnp.abs(d_tot) > total_cap)
        capped = se3.state_boxplus(
            mean0, jnp.clip(d_tot, -total_cap, total_cap).reshape(K, 12))
        mean = jnp.where(exceeded, capped, cand)

    Lam, _ = information(chans)
    cov_new = jnp.linalg.inv(Lam)
    cov_new = 0.5 * (cov_new + cov_new.T)

    # Learn the background where the object (almost surely) is not. The
    # rate is deliberately slow (EMA 0.2) so a transient occluder is not
    # instantly adopted as scene — persistent scene changes still converge
    # in ~10 frames.
    #
    # ``learn_world=False`` freezes BOTH the background map and the
    # occlusion-memory chain: during a multi-hypothesis trial the world
    # model must stay fixed, or each wrong hypothesis LAUNDERS its
    # misfit into its own adapted world — measured (teleport-recovery
    # probe): a π-flip's uncovered true-object pixels were 74 %
    # absorbed into its background map within the 6 trial frames (EMA
    # 0.2) and its obs_loglik overtook the correct basin's on the last
    # two frames of the race.
    if learn_world:
        learn = (p_hit < 0.05) & jnp.isfinite(z_obs)
        bg_new = jnp.where(learn, 0.8 * bg + 0.2
                           * jnp.where(jnp.isfinite(z_obs), z_obs, bg),
                           bg)
    else:
        bg_new = bg

    occ_prior_new = belief.occ_prior
    if occ_pred is not None and learn_world:
        # the responsibilities are informative on INVALID pixels too
        # (the invalid-branch point masses: p_invalid_occluded >>
        # p_invalid_visible) — the chain accumulates everywhere, like
        # the PF's D10 posterior in image_loglik
        occ_prior_new = jnp.clip(1.0 - r_obj - r_bg, 0.0, 1.0)

    mean_out = mean[0] if single else mean
    nb = GaussianBelief(mean=mean_out, cov=cov_new, background=bg_new,
                        key=belief.key, occ_prior=occ_prior_new)
    (H_d, iR_d, innov_d), _ = chans
    w = r_obj / jnp.maximum(jnp.sum(r_obj), 1e-6)
    # mean object-responsibility over pixels the belief expects to be
    # object — the inlier-rate diagnostic (drops under occlusion).
    on_obj = p_hit > 0.5
    info = RgfStepInfo(
        mean_state=mean_out,
        mean_beta=jnp.sum(r_obj * on_obj) / jnp.maximum(
            jnp.sum(on_obj.astype(jnp.float32)), 1.0),
        innovation_rms=jnp.sqrt(jnp.sum(w * innov_d * innov_d)),
        obs_loglik=obs_ll)
    return nb, info


def rgf_step(belief: GaussianBelief, z_obs, render_fn, trans_params, dt,
             bp: beam_mod.BeamParams, ut=None, **update_kwargs):
    """predict ∘ update — one frame (ref: GaussianTracker::on_track)."""
    belief = predict(belief, dt, trans_params, ut)
    return update(belief, z_obs, render_fn, bp, ut, **update_kwargs)


def make_batched_step(render_fn, trans_params, dt,
                      bp: beam_mod.BeamParams, ut=None, **update_kwargs):
    """Multi-scene GF step: vmap ``rgf_step`` over a leading scene axis
    (P7 for the second estimator — the GF analog of the PF's
    multi-scene serving, SURVEY §5 scaling axes).

    The whole GF step is pure XLA (sigma renders included — the
    deferred candidate pass is matmuls/gathers), so scene batching is a
    plain ``vmap``: beliefs are a stacked ``GaussianBelief`` pytree
    (every leaf gains a leading S axis), observations are (S, N).
    One chip serves S independent 30 Hz streams with one compiled
    step; across chips, shard the scene axis of the same function with
    ``shard_map`` (scenes are pure data parallelism — no collectives).

    Returns ``step(beliefs, z_obs) → (beliefs', infos)`` (un-jitted;
    wrap in ``jax.jit`` at the call site so dt/donation policy stay
    caller-controlled).
    """
    import functools

    inner = functools.partial(rgf_step, render_fn=render_fn,
                              trans_params=trans_params, dt=dt, bp=bp,
                              ut=ut, **update_kwargs)

    def step(beliefs, z_obs):
        return jax.vmap(inner)(beliefs, z_obs)

    return step


def stack_beliefs(beliefs):
    """Stack per-scene GaussianBeliefs into one batched pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *beliefs)
