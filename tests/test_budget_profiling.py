"""Memory budgeting (ref D14 BufferConfiguration) + profiling helpers."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from dbot_ros_tpu.ops import budget
from dbot_ros_tpu.utils.profiling import Stopwatch, measure, pv


def test_estimate_scales_linearly_in_particles():
    e1 = budget.estimate_memory(1000, 4800, 1408)
    e2 = budget.estimate_memory(2000, 4800, 1408)
    assert e2.total_bytes > 1.8 * e1.total_bytes
    assert e1.belief_bytes == 1000 * 13 * 4 + 1000 * 4 + 1000 * 4800 * 4


def test_max_particles_fits_budget():
    mp = budget.max_particles(4800, 1408, backend="pallas")
    est = budget.estimate_memory(mp, 4800, 1408, backend="pallas")
    assert est.total_bytes <= budget.device_memory_bytes() * 0.6
    # and the next doubling would not fit
    est2 = budget.estimate_memory(mp * 2, 4800, 1408, backend="pallas")
    assert est2.total_bytes > budget.device_memory_bytes() * 0.6
    assert mp >= 10_000  # the north-star config fits comfortably


def test_check_fit_warns_when_oversized():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        budget.check_fit(1 << 21, 4800, 1408)
        assert any("HBM" in str(x.message) for x in w)


def test_stopwatch_and_measure(capsys):
    sw = Stopwatch()
    x = jnp.ones((8, 8)).sum()
    dt = sw.measure("toy", x)
    assert dt >= 0
    with measure("ctx") as out:
        out.append(jnp.zeros((4,)) + 1)
    pv("v", 3)
    text = capsys.readouterr().out
    assert "toy:" in text and "ctx:" in text and "v: 3" in text


def test_rgf_pixel_stride_degrade():
    """GF degrade-to-fit (ref D14 analog): stride grows with work, 1 for
    small problems, capped; GaussianTracker honors pixel_stride=0=auto."""
    from dbot_ros_tpu.ops.budget import rgf_pixel_stride

    assert rgf_pixel_stride(400, 128) == 1
    s1 = rgf_pixel_stride(4800, 1408)
    s3 = rgf_pixel_stride(4800, 1408, num_objects=3)
    assert s1 > 1 and s3 >= s1
    assert rgf_pixel_stride(4800 * 64, 4096 * 16) <= 64  # capped

    import numpy as np
    from dbot_ros_tpu import config as cfg
    from dbot_ros_tpu.trackers.gaussian import GaussianTracker
    from dbot_ros_tpu.utils.camera import make_camera
    from dbot_ros_tpu.utils.mesh import box_mesh

    K = np.array([[48.0, 0, 16], [0, 48.0, 16], [0, 0, 1.0]])
    cam = make_camera(K, 32, 32)
    conf = cfg.GaussianTrackerConfig(pixel_stride=0)
    tr = GaussianTracker(conf, meshes=[box_mesh(0.06, 0.05, 0.04)],
                         camera=cam)
    # tiny problem → auto keeps every pixel
    assert tr._pixel_idx is None


def test_xla_tri_chunk_degrades_with_particles():
    from dbot_ros_tpu.ops.budget import xla_tri_chunk

    # small batches keep the requested chunk
    assert xla_tri_chunk(512, 1200, 512) == 512
    # 8192 x 1200 px: 512-chunk would need 20 GB -> shrink under 2 GB
    c = xla_tri_chunk(8192, 1200, 512)
    assert c < 512
    assert 8192 * 1200 * c * 4 <= 2 * 1024 ** 3
    assert c % 16 == 0 and c >= 16
    # never below the floor
    assert xla_tri_chunk(10 ** 7, 10 ** 5, 512) == 16


def test_xla_tri_chunk_nonpositive_request_means_auto():
    from dbot_ros_tpu.ops.budget import xla_tri_chunk

    assert xla_tri_chunk(512, 1200, 0) >= 16       # auto, never 0
    assert xla_tri_chunk(512, 1200, -3) >= 16
    assert xla_tri_chunk(512, 1200, 8) == 8        # tiny explicit honored
