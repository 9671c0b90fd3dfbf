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
    rows via an all_gather of the occlusion map. The occlusion all_gather
    is the known scaling cost; the planned refinement (next round) is
    offspring-count redistribution with neighbor ``ppermute`` of surplus
    particles only, which removes the O(P·N_pix) collective.

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
from dbot_ros_tpu.utils import se3


def make_particle_mesh(n_devices: int = None, axis: str = "p") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


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
                          axis: str = "p"):
    """Build a jitted multi-chip RBC-PF step (single object per scene).

    Returns step(belief_sharded, z_obs) → (belief_sharded, mean_state,
    ess). The observation ``z_obs`` is replicated; all particle-axis
    leaves stay sharded in and out (donated by the caller if desired).
    """

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
            parents = jnp.clip(jnp.searchsorted(cdf, pos, side="left"),
                               0, total - 1)
            # Fetch parent state + occlusion rows (all_gather of the
            # particle-axis leaves; see module docstring for the planned
            # ppermute refinement).
            st_all = jax.lax.all_gather(states, axis, tiled=True)
            occ_all = jax.lax.all_gather(occ, axis, tiled=True)
            return (jnp.take(st_all, parents, axis=0),
                    jnp.zeros_like(log_w),
                    jnp.take(occ_all, parents, axis=0))

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
        _, vecs = jnp.linalg.eigh(A)
        qm = se3.quat_normalize(vecs[:, -1])
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
