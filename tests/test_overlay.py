"""Silhouette-overlay observability (the RViz mesh-marker analog, §5)."""

import os
import struct
import zlib

import numpy as np


def test_write_png_roundtrip(tmp_path):
    from dbot_ros_tpu.runtime.overlay import write_png

    rgb = (np.arange(5 * 7 * 3).reshape(5, 7, 3) % 256).astype(np.uint8)
    path = str(tmp_path / "t.png")
    write_png(path, rgb)
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (7, 5)
    # decode the IDAT scanlines and compare payload
    idat_off = raw.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", raw[idat_off - 8:idat_off - 4])[0]
    data = zlib.decompress(raw[idat_off:idat_off + idat_len])
    assert len(data) == 5 * (1 + 7 * 3)
    rows = [data[r * 22 + 1:(r + 1) * 22] for r in range(5)]
    np.testing.assert_array_equal(
        np.frombuffer(b"".join(rows), np.uint8).reshape(5, 7, 3), rgb)


def test_overlay_marks_object_silhouette():
    """The overlay must tint exactly the estimated-pose footprint."""
    import jax.numpy as jnp

    from dbot_ros_tpu.ops.raycast import raycast_depth
    from dbot_ros_tpu.runtime.overlay import overlay_rgb, render_silhouettes
    from dbot_ros_tpu.trackers.base import to_center_frame
    from dbot_ros_tpu.utils.camera import make_camera
    from dbot_ros_tpu.utils.mesh import box_mesh
    from dbot_ros_tpu.utils import se3

    K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1.0]])
    cam = make_camera(K, 32, 32)
    mesh = box_mesh(0.08, 0.06, 0.05)
    pose = np.concatenate([[0.0, 0.0, 0.6], np.asarray(se3.quat_identity())])
    pc = to_center_frame(jnp.asarray(pose), mesh.center)
    depth = np.asarray(raycast_depth(mesh, pc, cam.rays, 128)).reshape(32, 32)

    sil = render_silhouettes([mesh], pose, cam)
    assert sil[0].sum() > 20
    rgb = overlay_rgb(depth, sil)
    inside = rgb[sil[0]]
    outside = rgb[~sil[0]]
    # tinted region is redder than the background
    assert inside[:, 0].astype(int).mean() > inside[:, 1].astype(int).mean()
    assert abs(outside[:, 0].astype(int).mean()
               - outside[:, 1].astype(int).mean()) < 1e-6


def test_cli_simulate_writes_overlays(tmp_path):
    import json

    from dbot_ros_tpu.runtime.cli import main

    conf = {"tracker": "particle", "evaluation_count": 64,
            "camera": {"camera_matrix": [40.0, 0, 16, 0, 40.0, 16, 0, 0, 1],
                       "resolution": [32, 32], "downsampling_factor": 1},
            "observation": {"model_sigma": 0.005, "sigma_factor": 0.0},
            "transition": {"linear_acceleration_sigma": 0.4,
                           "angular_acceleration_sigma": 1.5,
                           "damping": 8.0}}
    # no mesh in config -> default? the CLI needs meshes; write an obj
    obj = tmp_path / "box.obj"
    from dbot_ros_tpu.utils.mesh import box_mesh
    m = box_mesh(0.08, 0.06, 0.05)
    with open(obj, "w") as fh:
        v = np.asarray(m.vertices[:m.num_vertices])
        f = np.asarray(m.faces[:m.num_triangles]) + 1
        for x in v:
            fh.write(f"v {x[0]} {x[1]} {x[2]}\n")
        for x in f:
            fh.write(f"f {x[0]} {x[1]} {x[2]}\n")
    conf["object"] = {"meshes": [str(obj)]}
    cpath = tmp_path / "conf.json"
    cpath.write_text(json.dumps(conf))
    out = tmp_path / "ov"
    rc = main(["simulate", "--config", str(cpath), "--frames", "8",
               "--distance", "0.6", "--overlay-every", "3",
               "--overlay-dir", str(out)])
    assert rc == 0
    files = sorted(os.listdir(out))
    assert files == ["frame_00000.png", "frame_00003.png",
                     "frame_00006.png"], files
    assert open(out / files[0], "rb").read(8) == b"\x89PNG\r\n\x1a\n"
