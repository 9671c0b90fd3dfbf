"""Shared candidate-coverage slack derivation (deferred + fused paths).

Both candidate-set renderers (ops/deferred.py and the fused Pallas
sensor) sample triangle ids at reference-pose pixel centers; for meshes
whose faces are finer than a pixel, a displaced particle's ray hits
triangles that appear at NO pixel center and would read as misses.
Accepting hits on a candidate's plane within a slack of its barycentric
footprint closes the gaps (see FusedSensor.bary_slack for the error
analysis). This module is the single source of the auto-slack rule so
both backends apply *identical* slack for the same scene (advisor r2:
divergent derivations complicated cross-backend parity debugging).

Rule: ``slack = bary_slack_px · pixel_footprint(z̄) / median_edge`` with
pixel footprint ``pitch · z̄`` (pitch = horizontal z=1 ray spacing =
1/fx), z̄ = the particle cloud's mean depth (max over objects), and the
finest mesh's median edge length.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MAX_SLACK = 4.0


def median_edge(meshes) -> float:
    """Min over meshes of the median triangle-edge length (the finest
    mesh drives the slack; coarser meshes stay pixel-bounded)."""
    edges = []
    for m in meshes:
        e1 = np.asarray(m.tri_e1[:m.num_triangles])
        e2 = np.asarray(m.tri_e2[:m.num_triangles])
        ln = np.concatenate([np.linalg.norm(e1, axis=1),
                             np.linalg.norm(e2, axis=1)])
        ln = ln[ln > 0]
        edges.append(float(np.median(ln)) if ln.size else 1.0)
    return max(min(edges), 1e-6)


def ray_pitch(rays, height: int, width: int) -> float:
    """Horizontal pixel pitch of the z=1 rays — exactly 1/fx for a
    pinhole camera (utils/camera.py ray construction)."""
    rr = np.asarray(rays).reshape(height, width, 3)
    return float(np.median(np.abs(np.diff(rr[..., 0], axis=1))))


def cloud_depth(z):
    """z̄ of a particle cloud: per-object mean depth, max over objects.

    ``z``: (P,) or (P, K) camera-frame z coordinates (traced ok).
    """
    z = jnp.asarray(z)
    if z.ndim == 1:
        z = z[:, None]
    return jnp.max(jnp.mean(z, axis=0))


def auto_bary_slack(zbar, pitch: float, med_edge: float,
                    bary_slack_px: float = 0.25):
    """The shared auto rule (see module docstring); clipped to keep the
    inside-test sane for pathologically fine meshes."""
    return jnp.clip(bary_slack_px * pitch * zbar / med_edge,
                    0.0, _MAX_SLACK)
