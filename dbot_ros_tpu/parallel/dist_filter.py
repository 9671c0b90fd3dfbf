"""Multi-chip particle filtering with shard_map (SURVEY.md §2.5, P1/P5-P7).

The reference's only scaling axis is GPU-tile data parallelism over
particles inside one process (D12-D14). Here particles shard across a
``jax.sharding.Mesh`` axis ("p"); the whole filter step runs under
``shard_map`` with explicit collectives:

  * likelihood evaluation: embarrassingly parallel per shard (the compute-
    dominant term — scaling efficiency lives here);
  * weight normalization / ESS / KL trigger: ``psum`` of shard-local
    logsumexp partials over ICI;
  * systematic resampling: ``all_gather`` of the (tiny: P floats) weight
    vector → identical global parent indices on every shard → each shard
    materializes its slice of offspring, fetching parent *state* via an
    all_gather of pose states (P×13 floats — small) and parent occlusion
    rows via an all_gather of the occlusion map — exact, but the occlusion
    all_gather is the scaling cost. :func:`make_island_step` removes it
    from the common path entirely (island-model PF: local resampling,
    rare block-regular island exchanges) at a small statistical cost.

Multi-object / multi-scene batching (P7) composes on an outer mesh axis
("b"): independent scenes are pure data parallelism (vmap over the scene
axis + sharding), exercised in dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dbot_ros_tpu.filters.rbcpf import ParticleBelief
from dbot_ros_tpu.models.transition import TransitionParams, sample_transition
from dbot_ros_tpu.ops import resample as rs
from dbot_ros_tpu.utils import se3


def make_particle_mesh(n_devices: int = None, axis: str = "p") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def _occ_hooks(loglik_fn):
    """Occlusion-leaf hooks: sensor-provided (opaque device layout, e.g.
    the fused Pallas sensor's kernel layout) or the (P, N) defaults."""
    gather = getattr(loglik_fn, "gather_occlusion", None) or (
        lambda occ, idx: jnp.take(occ, idx, axis=0))
    where = getattr(loglik_fn, "where_occlusion", None) or (
        lambda mask, a, b: jnp.where(mask[:, None], a, b))
    return gather, where


def init_distributed_belief(key, initial_poses, num_particles: int,
                            mesh: Mesh, num_pixels: int = None,
                            initial_occlusion_prob=0.1, sensor=None,
                            axis: str = "p") -> ParticleBelief:
    """Sharded belief whose occlusion leaf is per-shard sensor blocks.

    With a sensor that owns its occlusion layout (``init_occlusion``
    hook), the global leaf is the concatenation of the per-shard local
    blocks along axis 0 — each shard sees exactly the local layout the
    sensor expects. Otherwise this is init_belief + shard_belief.
    """
    from dbot_ros_tpu.filters.rbcpf import init_belief

    n_shards = mesh.shape[axis]
    if num_particles % n_shards:
        raise ValueError(f"num_particles {num_particles} not divisible by "
                         f"mesh axis size {n_shards}")
    belief = init_belief(key, initial_poses, num_particles,
                         num_pixels or 0, initial_occlusion_prob)
    if sensor is not None and hasattr(sensor, "init_occlusion"):
        local = sensor.init_occlusion(num_particles // n_shards,
                                      initial_occlusion_prob)
        # the occlusion leaf may be a pytree (e.g. the fused sensor's
        # lazy (q, age) tuple) — stack every leaf shard-wise so the
        # particle-axis sharding splits it back into the local blocks
        occ = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x] * n_shards, axis=0), local)
        belief = ParticleBelief(states=belief.states,
                                log_weights=belief.log_weights,
                                occlusion=occ, key=belief.key)
    return shard_belief(belief, mesh, axis)


def shard_belief(belief: ParticleBelief, mesh: Mesh,
                 axis: str = "p") -> ParticleBelief:
    """Place particle-axis leaves across the mesh (key replicated)."""
    pspec = NamedSharding(mesh, P(axis))
    rspec = NamedSharding(mesh, P())
    return ParticleBelief(
        states=jax.device_put(belief.states, pspec),
        log_weights=jax.device_put(belief.log_weights, pspec),
        occlusion=jax.device_put(belief.occlusion, pspec),
        key=jax.device_put(belief.key, rspec),
    )


def _global_log_normalizers(log_w, axis):
    """(logsumexp, sum of squared weights, KL) across all shards."""
    m_local = jnp.max(log_w)
    m = jax.lax.pmax(m_local, axis)
    s1 = jax.lax.psum(jnp.sum(jnp.exp(log_w - m)), axis)
    lse = m + jnp.log(s1)
    ln = log_w - lse
    w = jnp.exp(ln)
    s2 = jax.lax.psum(jnp.sum(w * w), axis)
    p_total = jax.lax.psum(jnp.float32(log_w.shape[0]), axis)
    kl = jax.lax.psum(jnp.sum(w * jnp.where(w > 0, ln, 0.0)), axis) \
        + jnp.log(p_total)
    return lse, s2, kl, p_total


def make_distributed_step(mesh: Mesh, loglik_fn: Callable,
                          trans_params: TransitionParams, dt: float,
                          max_kl_divergence: float = 1.0,
                          axis: str = "p", exchange: str = "neighbor",
                          max_hops: int = 1):
    """Build a jitted multi-chip RBC-PF step (single object per scene).

    Returns step(belief_sharded, z_obs) → (belief_sharded, mean_state,
    ess). The observation ``z_obs`` is replicated; all particle-axis
    leaves stay sharded in and out (donated by the caller if desired).

    ``exchange`` picks how resampling fetches parent occlusion maps across
    shards (the O(P·N_pix) movement — SURVEY.md hard part #2):

      * ``"neighbor"`` (default): bounded-hop exchange exploiting that
        systematic-resampling parents are globally *sorted* — shard s's
        offspring rows [sL, (s+1)L) draw parents from one contiguous
        index range, which for non-degenerate weights lies within
        ``max_hops`` shards of s. Each of the 2H+1 hops is one
        ``ppermute`` of the local block; total ICI traffic is (2H+1)
        blocks instead of the ring's S blocks — resampling cost stops
        growing with the mesh. The needed hop count is computed
        globally (pmax — uniform across shards) and frames whose
        parents reach further fall back to the full ring, so the
        result is exact for any weights.
      * ``"ring"``: S-step ppermute ring — each shard streams every
        block past exactly once and plucks the rows its offspring need.
        Same total ICI traffic as an all_gather but **peak memory O(2
        local blocks)** instead of O(S) — the occlusion map never
        materializes unsharded, so particle counts can scale with the
        mesh. Block-regular, bisection-friendly traffic.
      * ``"all_gather"``: gather the full map then take (simplest;
        bounded by per-chip HBM).

    Parent *states* are always fetched via all_gather — (P, K, 13) floats
    is negligible. Works with any sensor, including the fused Pallas
    sensor whose occlusion leaf lives in an opaque kernel layout (hooks
    ``gather_occlusion``/``where_occlusion``).
    """
    occ_gather, occ_where = _occ_hooks(loglik_fn)
    if exchange not in ("neighbor", "ring", "all_gather"):
        raise ValueError(f"unknown exchange mode: {exchange!r}")

    def step_local(states, log_w, occ, key, z_obs):
        # shapes here are the per-shard blocks
        idx = jax.lax.axis_index(axis)
        n_shards = jax.lax.axis_size(axis)
        p_local = states.shape[0]

        key_next, k_trans, k_res = jax.random.split(key[0], 3)
        k_trans = jax.random.fold_in(k_trans, idx)

        # --- transition + likelihood (block-parallel, zero comms)
        new_block = sample_transition(k_trans, states[:, 0], dt,
                                      trans_params)
        states = states.at[:, 0].set(new_block)
        loglik, occ_post = loglik_fn(states, occ, z_obs, dt)
        occ = occ_post
        log_w = log_w + loglik

        # --- global weight stats (psum over ICI)
        lse, s2, kl, p_total = _global_log_normalizers(log_w, axis)
        ln = log_w - lse
        ess = 1.0 / s2

        # --- KL-triggered global systematic resampling
        def do_resample(args):
            states, log_w, occ = args
            w_all = jax.lax.all_gather(jnp.exp(ln), axis, tiled=True)
            cdf = jnp.cumsum(w_all)
            u = jax.random.uniform(k_res, ())  # same key → same u everywhere
            total = w_all.shape[0]
            pos = (jnp.arange(p_local, dtype=jnp.float32)
                   + idx * p_local + u) / total
            # pos is ascending -> rank by one merged sort instead of
            # the while-loop binary search (see resample.py notes)
            parents = jnp.clip(rs.sorted_searchsorted_left(cdf, pos),
                               0, total - 1)
            # Parent states: tiny, always all_gather.
            st_all = jax.lax.all_gather(states, axis, tiled=True)
            new_states = jnp.take(st_all, parents, axis=0)

            def pluck(out, blk, src):
                """Copy rows of `parents` owned by shard `src` from blk."""
                local_idx = jnp.clip(parents - src * p_local, 0,
                                     p_local - 1)
                mask = ((parents >= src * p_local)
                        & (parents < (src + 1) * p_local))
                return occ_where(mask, occ_gather(blk, local_idx), out)

            def full_ring(occ):
                # At round r shard `idx` holds shard (idx+r)%S's block;
                # it copies the rows of parents owned by that shard, then
                # passes the block along the ring.
                ring = [(i, (i - 1) % n_shards) for i in range(n_shards)]

                def round_body(r, carry):
                    held, out = carry
                    out = pluck(out, held, (idx + r) % n_shards)
                    held = jax.lax.ppermute(held, axis, ring)
                    return held, out

                zero = jax.tree_util.tree_map(jnp.zeros_like, occ)
                _, new_occ = jax.lax.fori_loop(
                    0, n_shards, round_body, (occ, zero))
                return new_occ

            if exchange == "all_gather":
                occ_all = jax.lax.all_gather(occ, axis, tiled=True)
                new_occ = jnp.take(occ_all, parents, axis=0)
            elif exchange == "ring" or n_shards <= 2 * max_hops + 1:
                new_occ = full_ring(occ)
            else:
                # Neighbor: parents are sorted, so this shard needs rows
                # from owner shards within [d_min, d_max] hops of itself.
                # The hop span is reduced globally (uniform predicate) so
                # every shard takes the same branch; overflow frames run
                # the exact full ring.
                owner = parents // p_local
                d = owner - idx
                span = jax.lax.pmax(
                    jnp.maximum(jnp.max(d), -jnp.min(d)), axis)

                def neighbor(occ):
                    out = jax.tree_util.tree_map(jnp.zeros_like, occ)
                    out = pluck(out, occ, idx)
                    for h in range(1, max_hops + 1):
                        for s in (h, -h):
                            # blk on shard i = shard (i+s) mod S's block
                            perm = [((i + s) % n_shards, i)
                                    for i in range(n_shards)]
                            blk = jax.lax.ppermute(occ, axis, perm)
                            out = pluck(out, blk, (idx + s) % n_shards)
                    return out

                new_occ = jax.lax.cond(span <= max_hops, neighbor,
                                       full_ring, occ)

            return (new_states, jnp.zeros_like(log_w), new_occ)

        def no_resample(args):
            return args

        states, log_w, occ = jax.lax.cond(
            kl > max_kl_divergence, do_resample, no_resample,
            (states, log_w, occ))

        # --- weighted mean state (psum-reduced)
        # recompute normalizer after the potential resample
        lse2, _, _, _ = _global_log_normalizers(log_w, axis)
        w = jnp.exp(log_w - lse2)
        lin = jax.lax.psum(jnp.einsum("p,pkd->kd", w, states), axis)
        q = states[..., 0, 3:7]
        A = jax.lax.psum(jnp.einsum("p,pi,pj->ij", w, q, q), axis)
        # principal eigenvector by power iteration (see se3.states_mean —
        # eigh on a 4x4 is disproportionately slow under jit on TPU)
        qm = A[:, 0] / jnp.maximum(jnp.linalg.norm(A[:, 0]), 1e-12)
        for _ in range(12):
            qm = A @ qm
            qm = qm / jnp.maximum(jnp.linalg.norm(qm), 1e-20)
        qm = qm * jnp.where(qm[0] < 0, -1.0, 1.0)
        mean_state = jnp.concatenate(
            [lin[0, :3], qm, lin[0, 7:13]], axis=-1)

        return states, log_w, occ, key_next[None], mean_state, ess

    pspec = P(axis)
    rspec = P()
    sharded = shard_map(
        step_local, mesh=mesh,
        in_specs=(pspec, pspec, pspec, rspec, rspec),
        out_specs=(pspec, pspec, pspec, rspec, rspec, rspec),
        check_vma=False)

    @jax.jit
    def step(belief: ParticleBelief, z_obs):
        states, log_w, occ, key, mean_state, ess = sharded(
            belief.states, belief.log_weights, belief.occlusion,
            belief.key[None], z_obs)
        return (ParticleBelief(states=states, log_weights=log_w,
                               occlusion=occ, key=key[0]),
                mean_state, ess)

    return step


# ---------------------------------------------------------------------------
# Island-model distributed PF: zero collectives on the common path
# ---------------------------------------------------------------------------

def make_island_step(mesh: Mesh, loglik_fn: Callable,
                     trans_params: TransitionParams, dt: float,
                     max_kl_divergence: float = 1.0,
                     island_max_kl: float = 0.5,
                     axis: str = "p"):
    """Island-model RBC-PF step (Vergé et al., "island particle filter").

    The plain distributed step (make_distributed_step) pays an all_gather
    of the particle state AND the occlusion map on every KL-triggered
    resample — the O(P·N_pix) collective that SURVEY.md flags as hard
    part #2. The island model removes it from the common path:

      * each shard ("island") runs a complete local PF: local likelihoods,
        local KL-triggered systematic resampling — **no communication**
        (occlusion lineage gathers use the sensor's ``gather_occlusion``
        hook, so the fused Pallas sensor's kernel-layout occlusion state
        works unchanged inside shard_map);
      * the island itself carries a log-weight ``b_i`` (its share of the
        global marginal likelihood), updated with the island's local
        logsumexp increment each frame;
      * only when the *island* weights degenerate (KL over n_islands
        exceeds ``island_max_kl``) are whole island blocks exchanged —
        a block-regular collective (all_gather + select of equal-size
        blocks), far rarer than particle-level resampling and perfectly
        shaped for ICI.

    Posterior queries (mean state, ESS) weight island-locally-normalized
    particles by the island weights via psum — exact, cheap.

    Belief layout: identical to the plain step, plus the island log-weight
    folded into ``log_weights`` (each shard's block carries its island
    offset b_i/L added to every local log weight, so the global weight
    vector remains exactly the importance weights of the full filter).
    """
    occ_gather, _ = _occ_hooks(loglik_fn)

    def step_local(states, log_w, occ, key, z_obs):
        idx = jax.lax.axis_index(axis)
        n_islands = jax.lax.axis_size(axis)
        p_local = states.shape[0]

        key_next, k_trans, k_res, k_isl = jax.random.split(key[0], 4)
        k_trans = jax.random.fold_in(k_trans, idx)
        k_res = jax.random.fold_in(k_res, idx)

        # --- transition + likelihood (no comms)
        new_block = sample_transition(k_trans, states[:, 0], dt,
                                      trans_params)
        states = states.at[:, 0].set(new_block)
        loglik, occ_post = loglik_fn(states, occ, z_obs, dt)
        occ = occ_post
        log_w = log_w + loglik

        # --- island decomposition: b = local logsumexp, ln = local norm
        m_loc = jnp.max(log_w)
        b = m_loc + jnp.log(jnp.sum(jnp.exp(log_w - m_loc)))  # island lw
        ln_local = log_w - b                                   # sums to 1

        # --- local KL-triggered resampling (no comms)
        kl_local = jnp.sum(
            jnp.exp(ln_local) * jnp.where(jnp.exp(ln_local) > 0,
                                          ln_local, 0.0)) \
            + jnp.log(jnp.float32(p_local))

        def local_resample(args):
            states, occ, ln_local = args
            parents = jnp.clip(
                rs.sorted_searchsorted_left(
                    jnp.cumsum(jnp.exp(ln_local)),
                    (jnp.arange(p_local, dtype=jnp.float32)
                     + jax.random.uniform(k_res, ())) / p_local),
                0, p_local - 1)
            return (jnp.take(states, parents, axis=0),
                    occ_gather(occ, parents),
                    jnp.full((p_local,), -jnp.log(jnp.float32(p_local))))

        def no_local_resample(args):
            return args

        states, occ, ln_local = jax.lax.cond(
            kl_local > max_kl_divergence, local_resample,
            no_local_resample, (states, occ, ln_local))

        # --- island-level bookkeeping (scalar collectives only)
        m_b = jax.lax.pmax(b, axis)
        sum_b = jax.lax.psum(jnp.exp(b - m_b), axis)
        bn = b - (m_b + jnp.log(sum_b))                 # normalized island lw
        w_isl = jnp.exp(bn)
        kl_islands = jax.lax.psum(
            w_isl * jnp.where(w_isl > 0, bn, 0.0), axis) \
            + jnp.log(jnp.float32(n_islands))

        # --- rare island resampling: exchange whole blocks
        def island_resample(args):
            states, occ, ln_local, bn = args
            bn_all = jax.lax.all_gather(bn, axis)              # (S,)
            cdf = jnp.cumsum(jnp.exp(bn_all))
            u = jax.random.uniform(k_isl, ())  # same everywhere
            pos = (jnp.float32(idx) + u) / n_islands
            src = jnp.clip(jnp.searchsorted(cdf, pos, side="left"),
                           0, n_islands - 1)
            st_all = jax.lax.all_gather(states, axis)          # (S, L, ...)
            # occ may be a pytree (lazy (q, age) tuple) — gather/index
            # each leaf
            occ_sel = jax.tree_util.tree_map(
                lambda x: jax.lax.all_gather(x, axis)[src], occ)
            ln_all = jax.lax.all_gather(ln_local, axis)
            return (st_all[src], occ_sel, ln_all[src],
                    -jnp.log(jnp.float32(n_islands)))

        def no_island_resample(args):
            states, occ, ln_local, bn = args
            return states, occ, ln_local, bn

        states, occ, ln_local, bn = jax.lax.cond(
            kl_islands > island_max_kl, island_resample,
            no_island_resample, (states, occ, ln_local, bn))

        # --- globally consistent weights: w(p on island i) ∝ bn_i + ln
        log_w_out = bn + ln_local

        # --- posterior mean + ESS (psum reductions)
        lse2, s2, _, _ = _global_log_normalizers(log_w_out, axis)
        w = jnp.exp(log_w_out - lse2)
        lin = jax.lax.psum(jnp.einsum("p,pkd->kd", w, states), axis)
        q = states[..., 0, 3:7]
        A = jax.lax.psum(jnp.einsum("p,pi,pj->ij", w, q, q), axis)
        qm = A[:, 0] / jnp.maximum(jnp.linalg.norm(A[:, 0]), 1e-12)
        for _ in range(10):
            qm = A @ qm
            qm = qm / jnp.maximum(jnp.linalg.norm(qm), 1e-20)
        qm = qm * jnp.where(qm[0] < 0, -1.0, 1.0)
        mean_state = jnp.concatenate([lin[0, :3], qm, lin[0, 7:13]],
                                     axis=-1)
        ess = 1.0 / s2

        return (states, log_w_out, occ, key_next[None], mean_state, ess)

    pspec = P(axis)
    rspec = P()
    sharded = shard_map(
        step_local, mesh=mesh,
        in_specs=(pspec, pspec, pspec, rspec, rspec),
        out_specs=(pspec, pspec, pspec, rspec, rspec, rspec),
        check_vma=False)

    @jax.jit
    def step(belief: ParticleBelief, z_obs):
        states, log_w, occ, key, mean_state, ess = sharded(
            belief.states, belief.log_weights, belief.occlusion,
            belief.key[None], z_obs)
        return (ParticleBelief(states=states, log_weights=log_w,
                               occlusion=occ, key=key[0]),
                mean_state, ess)

    return step
