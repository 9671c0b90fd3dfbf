"""Automatic pose initialization from a depth frame.

Replaces the reference's human-in-the-loop init (R9
``InteractiveMarkerInitializer`` — drag a marker in RViz until it covers
the object — and the detection-assisted path R11): a coarse 6-DoF search
that needs no operator.

Pipeline (one jitted scoring pass):
  1. Foreground segmentation: valid pixels inside a depth band → 3-D
     points via the camera rays; robust (median) centroid seeds candidate
     positions (the object's centroid sits roughly half an object-depth
     behind the observed front surface).
  2. Orientation candidates: a fixed coverage set of rotations (icosphere
     vertex axes × spins) plus optional random extras.
  3. Every candidate pose is scored with the same beam-model image
     log-likelihood the trackers use (models/image_loglik.py) — candidates
     are just a particle batch through ops/raycast.
  4. The best candidate (optionally after a short local PF refinement
     burst) becomes the initial pose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.models import beam as beam_mod
from dbot_ros_tpu.models import occlusion as occ_mod
from dbot_ros_tpu.models.image_loglik import image_loglik
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import CameraModel, preprocess_depth
from dbot_ros_tpu.utils.mesh import TriangleMesh, icosphere_mesh


def orientation_candidates(n_axes: int = 12, n_spins: int = 4):
    """Coverage set of rotations: icosahedron axes × in-plane spins."""
    ico = icosphere_mesh(radius=1.0, subdivisions=0, center=False)
    axes = np.asarray(ico.vertices[:ico.num_vertices], np.float64)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    axes = axes[:n_axes]
    quats = []
    for ax in axes:
        # rotation taking +z to ax
        z = np.array([0.0, 0.0, 1.0])
        v = np.cross(z, ax)
        s = np.linalg.norm(v)
        c = float(np.dot(z, ax))
        if s < 1e-8:
            base = np.array([1.0, 0, 0, 0]) if c > 0 else \
                np.array([0.0, 1.0, 0, 0])
        else:
            angle = np.arctan2(s, c)
            base = np.concatenate([[np.cos(angle / 2)],
                                   np.sin(angle / 2) * v / s])
        for k in range(n_spins):
            spin = 2 * np.pi * k / n_spins
            qspin = np.array([np.cos(spin / 2), 0, 0, np.sin(spin / 2)])
            # compose: base ∘ spin(z)
            w1, x1, y1, z1 = base
            w2, x2, y2, z2 = qspin
            quats.append([
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ])
    return jnp.asarray(np.array(quats), jnp.float32)


def segment_centroid(depth, camera: CameraModel, min_depth=0.3,
                     max_depth=1.5, fg_mask=None):
    """Robust 3-D centroid of the foreground band → (centroid, n_pixels).

    Uses the median per coordinate — insensitive to background pixels
    leaking into the band. ``fg_mask`` (N,) bool optionally restricts
    the foreground (multi-object clustering).
    """
    z = preprocess_depth(jnp.asarray(depth, jnp.float32).reshape(-1))
    mask = jnp.isfinite(z) & (z > min_depth) & (z < max_depth)
    if fg_mask is not None:
        mask = mask & jnp.asarray(fg_mask).reshape(-1)
    pts = camera.rays * z[:, None]
    masked = jnp.where(mask[:, None], pts, jnp.nan)
    return jnp.nanmedian(masked, axis=0), jnp.sum(mask)


def find_initial_pose(depth, mesh: TriangleMesh, camera: CameraModel,
                      bp: beam_mod.BeamParams = None,
                      op: occ_mod.OcclusionParams = None,
                      min_depth=0.3, max_depth=1.5,
                      n_axes: int = 12, n_spins: int = 4,
                      depth_offsets=(0.0, 0.03, 0.06),
                      refine_particles: int = 256,
                      refine_steps: int = 4, polish_rounds: int = 3,
                      key=None, return_beams: bool = False,
                      fg_mask=None, scene_depth=None):
    """Search for the object pose in one frame → (pose (7,), score).

    The returned pose is in the *centered-mesh* frame (what the filters
    use); :func:`initialize_tracker` handles the model-frame conversion.

    Multi-object hooks (used by :func:`find_initial_poses`):
      * ``fg_mask`` (N,) bool restricts the foreground used for the
        centroid seed and silhouette alignment to one object's pixel
        cluster (scoring stays full-frame — constant across candidates);
      * ``scene_depth`` (N,) is a depth render of already-placed objects:
        candidates are scored min-combined with it (explaining-away — a
        candidate hidden behind a placed object is not rewarded), and
        alignment only trusts pixels where the candidate is in front.
    """
    bp = bp or beam_mod.make_beam_params()
    op = op or occ_mod.make_occlusion_params()
    key = key if key is not None else jax.random.PRNGKey(0)

    z = preprocess_depth(jnp.asarray(depth, jnp.float32).reshape(-1))
    fg_sel = jnp.isfinite(z) & (z > min_depth) & (z < max_depth)
    if fg_mask is not None:
        fg_sel = fg_sel & jnp.asarray(fg_mask).reshape(-1)
    centroid, n_fg = segment_centroid(z, camera, min_depth, max_depth,
                                      fg_mask=fg_mask)

    quats = orientation_candidates(n_axes, n_spins)      # (Q, 4)
    view = centroid / jnp.maximum(jnp.linalg.norm(centroid), 1e-6)
    seed = centroid + jnp.float32(depth_offsets[1] if
                                  len(depth_offsets) > 1 else 0.03) * view
    poses = jnp.concatenate([
        jnp.broadcast_to(seed, (quats.shape[0], 3)), quats], axis=-1)

    # Budget-degrade the raycast triangle chunk to the candidate batch
    # (ref D14, ops/budget.xla_tri_chunk): the refine generations score
    # beam×particles ≈ 2k poses at once, and the default 512-chunk scan
    # intermediate is then (2k, N, 512) f32 ≈ 20 GB at the production
    # 80×60 frame — measured OOM (28.4 GB requested of 15.75 GB HBM)
    # during an on-chip watchdog re-init, session 33.
    from dbot_ros_tpu.ops.budget import xla_tri_chunk

    def score(poses):
        depth_pred = raycast_depth(
            mesh, poses, camera.rays,
            xla_tri_chunk(poses.shape[0], camera.num_pixels))
        if scene_depth is not None:
            depth_pred = jnp.minimum(depth_pred, scene_depth[None, :])
        occ0 = jnp.full((poses.shape[0], camera.num_pixels),
                        op.initial_occlusion_prob)
        ll, _ = image_loglik(depth_pred, z, occ0, bp, op, 1.0)
        return ll

    # Analytic position alignment per candidate BEFORE ranking: the
    # centroid seed is biased (median of *visible* surface ≠ object
    # center), and a few cm of position error corrupts the coarse scores
    # enough to bury the true orientation. Correct each candidate by the
    # robust depth offset (median of observed − predicted over the
    # overlap) and the silhouette-centroid shift (tangent plane), twice.
    fg = fg_sel
    obs_cx = jnp.sum(jnp.where(fg, camera.rays[:, 0], 0.0)) \
        / jnp.maximum(jnp.sum(fg), 1.0)
    obs_cy = jnp.sum(jnp.where(fg, camera.rays[:, 1], 0.0)) \
        / jnp.maximum(jnp.sum(fg), 1.0)

    def align(poses):
        pred = raycast_depth(
            mesh, poses, camera.rays,
            xla_tri_chunk(poses.shape[0], camera.num_pixels))  # (C, N)
        on = jnp.isfinite(pred)
        if scene_depth is not None:
            # only trust pixels where the candidate is actually visible
            on = on & (pred <= scene_depth[None, :] + 0.01)
        both = on & fg[None, :]
        nb = jnp.maximum(jnp.sum(both, axis=-1), 1.0)
        dz = jnp.where(both, z[None, :] - pred, jnp.nan)
        dz = jnp.nan_to_num(jnp.nanmedian(dz, axis=-1))  # (C,)
        non = jnp.maximum(jnp.sum(on, axis=-1), 1.0)
        pcx = jnp.sum(jnp.where(on, camera.rays[None, :, 0], 0.0),
                      axis=-1) / non
        pcy = jnp.sum(jnp.where(on, camera.rays[None, :, 1], 0.0),
                      axis=-1) / non
        depth0 = poses[:, 2]
        shift = jnp.stack([(obs_cx - pcx) * depth0,
                           (obs_cy - pcy) * depth0, dz], axis=-1)
        return poses.at[:, :3].add(shift)

    poses = align(align(poses))
    ll = score(poses)

    # Beam refinement: the coarse position seed can be several cm off
    # (median of *visible* points vs true centroid), which distorts the
    # coarse scores enough that a wrong near-symmetric orientation can
    # outrank the true one. Refining only the argmax then locks into that
    # local optimum — so carry the top-M orientations through the local
    # search and pick the best *refined* pose.
    # Orientation-diverse beam selection: greedily take the best-scoring
    # candidates whose orientation differs from everything already taken
    # (otherwise one attractive wrong basin can fill the whole beam and
    # the true basin never gets refined).
    beam = 8
    order = jnp.argsort(-ll)
    sorted_poses = poses[order]
    sorted_q = sorted_poses[:, 3:7]
    n_sorted = sorted_q.shape[0]
    suppressed = jnp.zeros((n_sorted,), bool)
    picks = []
    for _ in range(beam):
        idx = jnp.argmax(~suppressed)                    # best unsuppressed
        picks.append(idx)
        qdot = jnp.abs(jnp.sum(sorted_q * sorted_q[idx][None, :], axis=-1))
        near = qdot > 0.93                               # within ~42°
        suppressed = suppressed | near
        suppressed = suppressed.at[idx].set(True)
    beams = sorted_poses[jnp.stack(picks)]               # (M, 7)

    for step in range(refine_steps):
        key, k1, k2 = jax.random.split(key, 3)
        # Re-run the analytic position alignment every generation: with
        # a ~5 mm beam sigma the correct basin is a needle in 6-DoF —
        # random search alone lands the easy (broad, e.g. symmetric-flip)
        # basins first. Aligning each beam's position analytically
        # reduces the search to orientation, where the coverage grid +
        # annealed proposals are dense enough. (Measured: the true L
        # orientation scored 128 nats above the flipped one yet lost the
        # refinement without this.)
        beams = align(beams)
        # Wide first generation: a coarse-grid winner can sit ~40° from
        # its basin optimum (orientation grid spacing), so the first
        # rotation proposal must cover that. Anneal GEOMETRICALLY down
        # to a fixed fine scale (~0.03 rad / 3 mm) whatever the step
        # count: the beam model's ~5 mm sigma makes the optimum a
        # needle, and a schedule that stops at coarse scales leaves the
        # correct basin ~100 nats under-refined — enough for a broad
        # symmetric-flip basin to outrank it (measured on the 2-object
        # L scene).
        frac = step / max(refine_steps - 1, 1)
        rot_s = 0.55 * (0.03 / 0.55) ** frac
        pos_s = 0.02 * (0.003 / 0.02) ** frac
        m = beams.shape[0]
        dpos = pos_s * jax.random.normal(k1, (m, refine_particles, 3))
        drot = rot_s * jax.random.normal(k2, (m, refine_particles, 3))
        cands = jnp.concatenate([
            beams[:, None, :3] + dpos,
            se3.quat_boxplus(jnp.broadcast_to(
                beams[:, None, 3:7], (m, refine_particles, 4)), drot)],
            -1)
        cands = jnp.concatenate([beams[:, None], cands], axis=1)
        ll_c = score(cands.reshape(-1, 7)).reshape(m, -1)
        best_per_beam = jnp.argmax(ll_c, axis=1)
        beams = jnp.take_along_axis(
            cands, best_per_beam[:, None, None].repeat(7, -1), axis=1
        )[:, 0]
        beam_ll = jnp.take_along_axis(ll_c, best_per_beam[:, None],
                                      axis=1)[:, 0]

    # Polish: deterministic rotation coordinate descent + analytic
    # position alignment. The anneal ladder locks basins but leaves
    # beams up to ~0.15 rad / 40 nats under their optima — enough for a
    # broad wrong basin (e.g. a near-symmetric flip) to outrank a
    # narrow correct one, and enough that hypothesis particles seeded
    # from an under-refined beam die before the filter can finish the
    # job (weight decay beats in-filter random-walk refinement).
    # Isotropic Gaussian polish crawls on likelihood ridges; a per-axis
    # line search walks them directly.
    offsets = jnp.array([-0.12, -0.06, -0.03, -0.015, -0.0075, 0.0,
                         0.0075, 0.015, 0.03, 0.06, 0.12])
    n_off = offsets.shape[0]
    for _ in range(polish_rounds):
        beams = align(beams)
        m = beams.shape[0]
        for ax in range(3):
            dr = jnp.zeros((n_off, 3)).at[:, ax].set(offsets)
            q = se3.quat_boxplus(
                jnp.broadcast_to(beams[:, None, 3:7], (m, n_off, 4)),
                jnp.broadcast_to(dr[None], (m, n_off, 3)))
            cands = jnp.concatenate([
                jnp.broadcast_to(beams[:, None, :3], (m, n_off, 3)), q],
                -1)
            ll_c = score(cands.reshape(-1, 7)).reshape(m, n_off)
            best_per_beam = jnp.argmax(ll_c, axis=1)
            beams = jnp.take_along_axis(
                cands, best_per_beam[:, None, None].repeat(7, -1),
                axis=1)[:, 0]
            beam_ll = jnp.take_along_axis(ll_c, best_per_beam[:, None],
                                          axis=1)[:, 0]

    best = jnp.argmax(beam_ll)
    if return_beams:
        return beams[best], beam_ll[best], int(n_fg), beams, beam_ll
    return beams[best], beam_ll[best], int(n_fg)


def _cluster_masks(z, camera: CameraModel, n_clusters: int,
                   min_depth, max_depth, iters: int = 12):
    """Partition foreground pixels into ``n_clusters`` 3-D k-means
    clusters (host-side NumPy — init-time only) → list of (N,) masks.

    Seeded by spreading centers along the principal axis of the
    foreground point cloud, which separates side-by-side objects AND
    front/behind mutual-occlusion configurations (depth is a coordinate).
    """
    zn = np.asarray(z, np.float64).reshape(-1)
    fg = np.isfinite(zn) & (zn > min_depth) & (zn < max_depth)
    idx = np.where(fg)[0]
    masks_all = [np.zeros(zn.shape[0], bool) for _ in range(n_clusters)]
    if idx.size < 2 * n_clusters:
        for m in masks_all:
            m[idx] = True
        return [jnp.asarray(m) for m in masks_all]
    p = np.asarray(camera.rays, np.float64)[idx] * zn[idx, None]
    c0 = p.mean(0)
    d = p - c0
    ax = np.linalg.svd(d, full_matrices=False)[2][0]
    t = d @ ax
    qs = np.quantile(t, (np.arange(n_clusters) + 0.5) / n_clusters)
    centers = c0 + qs[:, None] * ax
    lab = np.zeros(idx.size, np.int64)
    for _ in range(iters):
        dist = ((p[:, None] - centers[None]) ** 2).sum(-1)
        lab = dist.argmin(1)
        for k in range(n_clusters):
            sel = lab == k
            if sel.any():
                centers[k] = p[sel].mean(0)
            else:
                # a cluster that lost all members is RE-SEEDED from the
                # largest cluster's farthest point (advisor r4:
                # duplicating the full foreground made two clusters
                # near-identical and could seed two objects on one
                # blob, leaning on explain-away alone to separate them)
                big = int(np.bincount(lab, minlength=n_clusters).argmax())
                pb = p[lab == big]
                centers[k] = pb[int(np.argmax(
                    ((pb - centers[big]) ** 2).sum(-1)))]
    # final assignment against the (possibly re-seeded) centers
    lab = ((p[:, None] - centers[None]) ** 2).sum(-1).argmin(1)
    for k in range(n_clusters):
        sel = lab == k
        if sel.any():
            masks_all[k][idx[sel]] = True
        else:
            # unreachable with the re-seed above unless idx.size <
            # n_clusters (already guarded); keep the NaN-safe fallback
            masks_all[k][idx] = True
    return [jnp.asarray(m) for m in masks_all]


def find_initial_poses(depth, meshes, camera: CameraModel,
                       bp: beam_mod.BeamParams = None,
                       op: occ_mod.OcclusionParams = None,
                       min_depth=0.3, max_depth=1.5, key=None, **kwargs):
    """Joint K-object auto-init → (poses (K, 7) centered frame, scores).

    The K ≥ 2 generalization of :func:`find_initial_pose` (R9/R11 for
    multi-object scenes; reference: one interactive marker *per object*,
    ``InteractiveMarkerInitializer`` holds a marker list): partition the
    foreground into K 3-D clusters, then greedily assign (object mesh,
    cluster) pairs best-score-first; each placed object is rendered into
    a scene-depth buffer so later searches score candidates with
    explaining-away (a candidate buried behind a placed object earns no
    credit for those pixels) and later alignments ignore hidden pixels.
    """
    meshes = list(meshes)
    num_objects = len(meshes)
    z = preprocess_depth(jnp.asarray(depth, jnp.float32).reshape(-1))
    key = key if key is not None else jax.random.PRNGKey(0)
    return_beams = bool(kwargs.pop("return_beams", False))
    if num_objects == 1:
        out = find_initial_pose(
            z, meshes[0], camera, bp=bp, op=op, min_depth=min_depth,
            max_depth=max_depth, key=key, return_beams=return_beams,
            **kwargs)
        if return_beams:
            pose, score, _, beams, beam_ll = out
            return pose[None], jnp.asarray([score]), [(beams, beam_ll)]
        pose, score, _ = out
        return pose[None], jnp.asarray([score])

    masks = _cluster_masks(z, camera, num_objects, min_depth, max_depth)
    scene = None
    placed = [None] * num_objects
    scores = [None] * num_objects
    obj_beams = [None] * num_objects
    remaining_obj = list(range(num_objects))
    remaining_clu = list(range(num_objects))
    while remaining_obj:
        best = None
        for o in remaining_obj:
            for c in remaining_clu:
                key, k = jax.random.split(key)
                pose, sc, _, beams, beam_ll = find_initial_pose(
                    z, meshes[o], camera, bp=bp, op=op,
                    min_depth=min_depth, max_depth=max_depth, key=k,
                    fg_mask=masks[c], scene_depth=scene,
                    return_beams=True, **kwargs)
                sc_f = float(sc)
                if np.isnan(sc_f):
                    continue            # degenerate search (empty fg)
                if best is None or sc_f > float(best[0]):
                    best = (sc, o, c, pose, beams, beam_ll)
        if best is None:
            raise ValueError(
                "multi-object init failed: no finite candidate score "
                "(empty/degenerate foreground?)")
        sc, o, c, pose, beams, beam_ll = best
        placed[o], scores[o], obj_beams[o] = pose, sc, (beams, beam_ll)
        remaining_obj.remove(o)
        remaining_clu.remove(c)
        pred = raycast_depth(meshes[o], pose, camera.rays)
        pred = jnp.where(jnp.isfinite(pred), pred, jnp.inf)
        scene = pred if scene is None else jnp.minimum(scene, pred)
    if return_beams:
        return jnp.stack(placed), jnp.stack(scores), obj_beams
    return jnp.stack(placed), jnp.stack(scores)


def initialize_tracker(tracker, depth, hypothesis_margin: float = 30.0,
                       min_hypotheses: int = 1,
                       reuse_background: bool = False, **kwargs):
    """Auto-initialize a ParticleTracker/GaussianTracker from one frame.

    For particle trackers, every refined beam pose within
    ``hypothesis_margin`` nats of the winner is kept as an init
    *hypothesis* (score-weighted particle mixture) — the Bayesian
    treatment of near-symmetric twins the one-shot search cannot
    distinguish (R9 known gap): the filter's own likelihood resolves
    them within a few frames. A clear winner collapses the softmax to
    a single hypothesis, reproducing the plain init exactly.

    ``min_hypotheses``: keep at least this many top beams per object
    even when the margin filter passes fewer — flip-aware RECOVERY
    (VERDICT r4 item 4): a locked-in wrong basin can score the search
    argmax decisively on one frame, so a watchdog re-init passes 2 and
    lets the GF's multi-hypothesis trial (or the PF's mixture) race the
    flip against the alternative over the next frames instead of
    committing to a single-frame decision.

    Temperature: raw scores are full-image log-likelihoods whose nat
    differences dwarf softmax — a twin 12 nats behind would get e⁻¹²
    of the particles (i.e. none). The kept logits are rescaled so the
    margin edge maps to ~1/P mass: every surviving hypothesis receives
    at least a particle's worth, while the ranking is preserved.
    """
    from dbot_ros_tpu.trackers import base

    meshes = (list(tracker.meshes) if hasattr(tracker, "meshes")
              else [tracker.mesh])
    if len(meshes) > 1:
        # K-object scene: joint greedy search with explaining-away, then
        # per-object hypothesis beams combined as a PRODUCT space through
        # the single hypothesis API — each particle's coordinate blocks
        # are independent, so the union likelihood resolves every
        # object's twin ambiguity independently (the near-symmetric-flip
        # failure mode is per-object, e.g. a π-flipped L at coarse
        # resolution).
        import inspect
        import itertools

        poses_center, scores, obj_beams = find_initial_poses(
            depth, meshes, tracker.camera, bp=tracker.beam_params,
            return_beams=True, **kwargs)
        centers = jnp.stack([m.center for m in meshes])
        poses_model = base.to_model_frame(poses_center, centers)
        hyp_kwargs = {}
        if "hypotheses" in inspect.signature(
                tracker.initialize).parameters:
            per_obj = []
            for o, (beams, beam_ll) in enumerate(obj_beams):
                order = np.argsort(-np.asarray(beam_ll))
                kept = [int(i) for i in order
                        if float(beam_ll[i]) >= float(beam_ll.max())
                        - hypothesis_margin][:4]
                if len(kept) < min_hypotheses:
                    kept = [int(i) for i in
                            order[:min(min_hypotheses, order.size)]]
                pm = jax.vmap(lambda p, _c=centers[o]:
                              base.to_model_frame(p, _c))(
                    beams[jnp.asarray(kept)])
                per_obj.append(
                    (pm, np.asarray(beam_ll)[kept]
                     - float(beam_ll.max())))
            if any(p[0].shape[0] > 1 for p in per_obj):
                combos = sorted(
                    itertools.product(*[range(p[0].shape[0])
                                        for p in per_obj]),
                    key=lambda c: -sum(per_obj[o][1][i]
                                       for o, i in enumerate(c)))[:32]
                hyp = jnp.stack([
                    jnp.stack([per_obj[o][0][i]
                               for o, i in enumerate(combo)])
                    for combo in combos])                    # (H, K, 7)
                logits = np.array([sum(per_obj[o][1][i]
                                       for o, i in enumerate(combo))
                                   for combo in combos], np.float32)
                n_part = int(getattr(getattr(tracker, "config", None),
                                     "evaluation_count", 1000))
                temp = hypothesis_margin / float(np.log(max(n_part, 2)))
                hyp_kwargs = dict(hypotheses=hyp,
                                  hypothesis_logits=jnp.asarray(
                                      logits / temp))
        if "first_frame" in inspect.signature(
                tracker.initialize).parameters:
            hyp_kwargs["first_frame"] = depth
        if reuse_background and "reuse_background" in inspect.signature(
                tracker.initialize).parameters:
            hyp_kwargs["reuse_background"] = True
        tracker.initialize(poses_model, **hyp_kwargs)
        return poses_model, float(jnp.sum(scores))

    mesh = meshes[0]
    pose_center, score, n_fg, beams, beam_ll = find_initial_pose(
        depth, mesh, tracker.camera, bp=tracker.beam_params,
        return_beams=True, **kwargs)
    pose_model = base.to_model_frame(pose_center, mesh.center)
    hyp_kwargs = {}
    import inspect
    if hasattr(tracker, "belief") and hasattr(
            getattr(type(tracker), "initialize", None), "__call__"):
        if "hypotheses" in inspect.signature(
                tracker.initialize).parameters:
            keep = beam_ll >= beam_ll.max() - hypothesis_margin
            if int(jnp.sum(keep)) < min_hypotheses:
                order = jnp.argsort(-beam_ll)
                keep = jnp.zeros_like(keep).at[
                    order[:min_hypotheses]].set(True)
            if int(jnp.sum(keep)) > 1:
                hyp = jax.vmap(
                    lambda p: base.to_model_frame(p, mesh.center))(
                        beams[keep])
                n_part = int(getattr(getattr(tracker, "config", None),
                                     "evaluation_count", 1000))
                temp = hypothesis_margin / float(
                    np.log(max(n_part, 2)))
                hyp_kwargs = dict(
                    hypotheses=hyp,
                    hypothesis_logits=(beam_ll[keep]
                                       - beam_ll.max()) / temp)
    if "first_frame" in inspect.signature(
            tracker.initialize).parameters:
        hyp_kwargs["first_frame"] = depth
    if reuse_background and "reuse_background" in inspect.signature(
            tracker.initialize).parameters:
        hyp_kwargs["reuse_background"] = True
    tracker.initialize(pose_model, **hyp_kwargs)
    return pose_model, score
