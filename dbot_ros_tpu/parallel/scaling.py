"""Scaling-efficiency benchmark harness (north star #3, BASELINE.md).

Measures filter-steps/s of the distributed RBC-PF at increasing device
counts with the particle budget scaled proportionally (weak scaling — the
production regime: more chips → more particles at the same frame rate).
Efficiency(n) = throughput(n) / (n · throughput(1)).

On a real pod slice the mesh axes come from jax.devices(); in CI the same
harness runs on the virtual CPU mesh (numbers are not meaningful there —
the harness is validated for mechanics, the driver runs it on hardware).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List

import jax
import jax.numpy as jnp

from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.parallel import dist_filter


@dataclasses.dataclass
class ScalingResult:
    device_counts: List[int]
    steps_per_s: List[float]
    particles: List[int]
    efficiency: List[float]

    def to_dict(self) -> Dict:
        return dataclasses.asdict(self)


def run_scaling(sensor, trans_params, camera, initial_pose,
                particles_per_device: int = 1024,
                device_counts=None, frames: int = 20,
                dt: float = 1.0 / 30.0, z_obs=None) -> ScalingResult:
    """Weak-scaling sweep over device counts (must divide jax.devices())."""
    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    if z_obs is None:
        raise ValueError("provide a depth observation z_obs")

    steps_per_s = []
    particles = []
    for n in device_counts:
        mesh = dist_filter.make_particle_mesh(n)
        p = particles_per_device * n
        belief = rbcpf.init_belief(jax.random.PRNGKey(0), initial_pose, p,
                                   camera.num_pixels)
        belief = dist_filter.shard_belief(belief, mesh)
        step = dist_filter.make_distributed_step(mesh, sensor, trans_params,
                                                 dt, max_kl_divergence=0.8)
        belief, mean_state, ess = step(belief, z_obs)   # compile
        jax.block_until_ready(belief.states)
        t0 = time.perf_counter()
        for _ in range(frames):
            belief, mean_state, ess = step(belief, z_obs)
        jax.block_until_ready(belief.states)
        dt_step = (time.perf_counter() - t0) / frames
        steps_per_s.append(1.0 / dt_step)
        particles.append(p)

    # Weak scaling: ideal keeps steps/s constant as devices (and
    # particles) grow → efficiency(n) = steps_per_s(n) / steps_per_s(1).
    eff = [s / steps_per_s[0] for s in steps_per_s]
    return ScalingResult(list(device_counts), steps_per_s, particles, eff)
