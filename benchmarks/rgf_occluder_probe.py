"""Probe: per-frame diagnostics for the occluder/rgf eval failure.

Runs the eval_suite occluder scenario with the RGF and prints, per frame,
position error, rotation error, mean_beta (inlier rate) and innovation RMS
to localize where/why the filter runs away (EVAL.md weak spot).
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from eval_suite import build_scene, make_source, make_tracker
from dbot_ros_tpu.utils import se3


def main(scenario=None):
    import sys as _s; scenario = scenario or (_s.argv[1] if len(_s.argv) > 1 else "occluder")
    frames = 45
    cam, mesh, occluder = build_scene()
    tracker = make_tracker("rgf", cam, mesh, 512, scenario)
    src = make_source(scenario, cam, mesh, occluder, frames)

    first = True
    for fr in src:
        if first:
            tracker.initialize(fr.ground_truth)
            first = False
        poses, info = tracker.track(fr.depth)
        gt = np.asarray(fr.ground_truth).reshape(-1, 7)[0]
        p = np.asarray(poses).reshape(-1, 7)[0]
        pe = float(np.linalg.norm(p[:3] - gt[:3]))
        qe = float(np.linalg.norm(np.asarray(
            se3.quat_boxminus(jax.numpy.asarray(gt[3:7]),
                              jax.numpy.asarray(p[3:7])))))
        print(f"t={fr.index:2d} pos_err={pe:.4f} rot_err={qe:.4f} "
              f"beta={float(info.mean_beta):.3f} "
              f"innov={float(info.innovation_rms):.4f}", flush=True)


if __name__ == "__main__":
    main()
