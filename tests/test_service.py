"""Control-service surface (ref M3 srv/action endpoints).

The reference ships small ROS service endpoints next to the tracker nodes
(object-finding service for detection-assisted init, plus the operator's
implicit marker-drag/restart controls). Here that surface is the
newline-JSON TrackerService drained by node.run between frames
(runtime/service.py); these tests drive it both programmatically and over
the Unix socket while a closed-loop synthetic run is in flight.
"""

import os
import threading
import time

import numpy as np
import pytest

from dbot_ros_tpu.runtime import node, sources
from dbot_ros_tpu.runtime.service import TrackerService, call
from dbot_ros_tpu.trackers.particle import ParticleTracker
from dbot_ros_tpu.utils.mesh import box_mesh

from tests.test_runtime import (linear_trajectory, small_camera,
                                small_particle_config)


def make_scene(frames=40):
    cam = small_camera()
    mesh = box_mesh(0.08, 0.06, 0.05)
    start = np.array([0.0, 0.0, 0.6, 1.0, 0, 0, 0], np.float32)
    src = sources.SyntheticSource(
        mesh, cam, linear_trajectory(start, [0.01, 0.0, 0.0]),
        num_frames=frames, noise_sigma=0.002, seed=0)
    tracker = ParticleTracker(small_particle_config(128), meshes=[mesh],
                              camera=cam)
    return cam, mesh, src, tracker


# ------------------------------------------------------- programmatic API

def test_submit_queue_and_status_roundtrip():
    svc = TrackerService()
    st = svc.submit({"cmd": "status"})
    assert st["ok"] and st["frame"] is None and st["pending"] == 0

    r = svc.submit({"cmd": "pause"})
    assert r["ok"] and svc.paused
    r = svc.submit({"cmd": "resume"})
    assert r["ok"] and not svc.paused

    r = svc.submit({"cmd": "reset_pose"})
    assert not r["ok"]                      # missing pose
    r = svc.submit({"cmd": "reset_pose", "pose": [0, 0, 0.6, 1, 0, 0, 0]})
    assert r["ok"] and r["queued"] and r["seq"] == 1
    assert svc.status()["pending"] == 1

    r = svc.submit({"cmd": "bogus"})
    assert not r["ok"]


def test_reset_pose_applies_on_loop_thread():
    _, _, src, tracker = make_scene(frames=6)
    svc = TrackerService()
    wrong = [0.3, 0.3, 1.5, 1, 0, 0, 0]
    svc.submit({"cmd": "reset_pose", "pose": wrong})

    run = node.run(tracker, src, service=svc)
    # the queued reset fired before frame 0's track step: the tracker was
    # re-initialized at the wrong pose, so the first estimates sit near it
    assert np.linalg.norm(run.poses[0, 0, :3] - wrong[:3]) < 0.2
    assert svc.status()["applied_seq"] == 1


def test_shutdown_stops_run_early():
    _, _, src, tracker = make_scene(frames=40)
    svc = TrackerService()

    count = {"n": 0}

    def on_frame(frame, poses, info):
        count["n"] += 1
        if count["n"] == 3:
            svc.submit({"cmd": "shutdown"})

    run = node.run(tracker, src, on_frame=on_frame, service=svc)
    assert 3 <= len(run.poses) < 10


def test_pause_holds_playback_until_resume():
    _, _, src, tracker = make_scene(frames=8)
    svc = TrackerService()
    t_paused = {}

    def on_frame(frame, poses, info):
        if frame.index == 2:
            svc.submit({"cmd": "pause"})
            t_paused["at"] = time.time()

    def resumer():
        while "at" not in t_paused:
            time.sleep(0.01)
        time.sleep(0.25)
        svc.submit({"cmd": "resume"})

    t = threading.Thread(target=resumer)
    t.start()
    run = node.run(tracker, src, on_frame=on_frame, service=svc)
    t.join()
    # pause held the replay (no frames dropped): every frame was tracked
    # exactly once — state-based, not wall-clock-based (scheduler jitter
    # made a timing assertion flaky; advisor r3)
    assert len(run.poses) == 8
    assert [m.frame for m in run.metrics.records] == list(range(8))


def test_shutdown_while_paused():
    _, _, src, tracker = make_scene(frames=8)
    svc = TrackerService()

    def on_frame(frame, poses, info):
        if frame.index == 1:
            svc.submit({"cmd": "pause"})
            threading.Timer(
                0.2, lambda: svc.submit({"cmd": "shutdown"})).start()

    run = node.run(tracker, src, on_frame=on_frame, service=svc)
    assert len(run.poses) == 2              # frames 0-1 only


def test_checkpoint_command(tmp_path):
    from dbot_ros_tpu.runtime.checkpoint import load_belief
    _, _, src, tracker = make_scene(frames=5)
    svc = TrackerService()
    path = str(tmp_path / "belief.npz")

    def on_frame(frame, poses, info):
        if frame.index == 1:
            svc.submit({"cmd": "checkpoint", "path": path})

    node.run(tracker, src, on_frame=on_frame, service=svc)
    assert os.path.exists(path)
    belief = load_belief(path)
    assert belief.states.shape == tracker.belief.states.shape


# ------------------------------------------------------------- unix socket

def test_socket_service_end_to_end(tmp_path):
    sock = str(tmp_path / "tracker.sock")
    _, _, src, tracker = make_scene(frames=60)
    svc = TrackerService(sock)

    result = {}

    def worker():
        result["run"] = node.run(tracker, src, service=svc)

    t = threading.Thread(target=worker)
    t.start()
    try:
        # poll status until the loop is past a few frames
        deadline = time.time() + 60
        st = {}
        while time.time() < deadline:
            st = call(sock, {"cmd": "status"})
            if st.get("frame") is not None and st["frame"] >= 2:
                break
            time.sleep(0.05)
        assert st.get("frame", -1) >= 2
        assert st["ok"] and len(st["poses"][0]) == 7

        r = call(sock, {"cmd": "shutdown"})
        assert r["ok"]
        t.join(timeout=60)
        assert not t.is_alive()
        assert len(result["run"].poses) < 60
    finally:
        svc.close()
        if t.is_alive():                     # pragma: no cover - safety
            t.join(timeout=5)


def test_bad_command_does_not_kill_loop():
    """A malformed queued command (operator typo) must be contained: the
    run finishes, the error is surfaced via status.last_error."""
    _, _, src, tracker = make_scene(frames=4)
    svc = TrackerService()
    svc.submit({"cmd": "reset_pose", "pose": [0.0, 0.0, 0.6]})  # 3 != 7
    svc.submit({"cmd": "checkpoint", "path": "/nonexistent/dir/x.npz"})
    run = node.run(tracker, src, service=svc)
    assert len(run.poses) == 4                  # loop survived
    st = svc.status()
    assert st["last_error"] and "seq" in st["last_error"]
    assert st["applied_seq"] == 2


def test_serve_refuses_live_socket(tmp_path):
    """A second service on a LIVE socket path must refuse (not yank the
    running tracker's control channel); a stale path is reclaimed."""
    import os
    import stat

    path = str(tmp_path / "ctl.sock")
    svc = TrackerService(path)
    try:
        # owner-only permissions on the bound socket
        mode = stat.S_IMODE(os.stat(path).st_mode)
        assert mode == 0o600, oct(mode)
        with pytest.raises(RuntimeError, match="in use"):
            TrackerService(path)
    finally:
        svc.close()
    # stale socket file (no listener behind it) is reclaimed
    with open(path, "a"):
        pass  # ensure a file exists at the path
    assert os.path.exists(path)
    svc2 = TrackerService(path)
    svc2.close()
