"""Native host-runtime tests (C++ lib via ctypes; ref dbot C++ plumbing).

Runs against the built libdbot_host.so when present; the fallback-path
tests always run (they must behave identically).
"""

import numpy as np
import pytest

from dbot_ros_tpu import native
from dbot_ros_tpu.native import FrameRing, preprocess_depth_u16

HAS_NATIVE = native.load_native() is not None


@pytest.mark.skipif(not HAS_NATIVE, reason="native lib not built")
def test_native_obj_parser_matches_python(tmp_path):
    from dbot_ros_tpu.utils.mesh import parse_obj
    text = ("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0.5 0.5 1\n"
            "f 1/1/1 2/2/1 3/3/1 4/4/1\nf 1//1 2//1 5//1\nf -3 -2 -1\n")
    p = tmp_path / "m.obj"
    p.write_text(text)
    v_py, f_py = parse_obj(text)
    out = native.try_parse_obj_native(str(p))
    assert out is not None
    v_c, f_c = out
    np.testing.assert_allclose(v_c, v_py)
    np.testing.assert_array_equal(f_c, f_py)


@pytest.mark.skipif(not HAS_NATIVE, reason="native lib not built")
def test_native_obj_parser_rejects_bad_faces(tmp_path):
    p = tmp_path / "bad.obj"
    p.write_text("v 0 0 0\nf 1 2 3\n")  # face references missing verts
    assert native.try_parse_obj_native(str(p)) is None


def test_preprocess_depth_u16_matches_reference():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 5000, size=(48, 64), dtype=np.uint16)
    raw[::7, ::5] = 0  # dropouts
    out = preprocess_depth_u16(raw, downsampling=4)
    assert out.shape == (12, 16)
    expect = raw[::4, ::4].astype(np.float32) / 1000.0
    expect[raw[::4, ::4] == 0] = np.nan
    # float32 mm→m conversion differs from float64 by ≤1 ulp
    np.testing.assert_allclose(out, expect, rtol=1e-6, equal_nan=True)


def test_frame_ring_drop_oldest_and_latest():
    ring = FrameRing((4, 4), capacity=3)
    for i in range(5):  # overflow: frames 0,1 dropped
        ring.push(np.full((4, 4), float(i), np.float32), stamp=float(i))
    frame, stamp, skipped = ring.pop_latest()
    assert frame[0, 0] == 4.0
    assert stamp == 4.0
    assert skipped >= 1
    assert ring.pop_latest() is None
    assert len(ring) == 0


def test_frame_ring_single_frame():
    ring = FrameRing((2, 2), capacity=4)
    ring.push(np.ones((2, 2), np.float32), stamp=1.5)
    frame, stamp, skipped = ring.pop_latest()
    assert skipped == 0
    assert stamp == 1.5
    np.testing.assert_allclose(frame, 1.0)


@pytest.mark.skipif(not HAS_NATIVE, reason="native lib not built")
def test_frame_ring_is_native():
    assert FrameRing((2, 2)).is_native


@pytest.mark.skipif(not HAS_NATIVE, reason="native lib not built")
def test_frame_ring_threaded_producer():
    import threading
    ring = FrameRing((8, 8), capacity=16)
    n = 200

    def produce():
        for i in range(n):
            ring.push(np.full((8, 8), float(i), np.float32), stamp=float(i))

    t = threading.Thread(target=produce)
    t.start()
    seen = -1.0
    got = 0
    while t.is_alive() or len(ring):
        out = ring.pop_latest()
        if out is not None:
            frame, stamp, skipped = out
            assert stamp >= seen  # monotonic freshness
            seen = stamp
            got += 1
    t.join()
    assert seen == float(n - 1)  # final frame always delivered
    assert got >= 1
