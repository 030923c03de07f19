"""LiveViewer HTTP dashboard: panes/state plumbing, freeview orbit camera
(DSHandler3D free-cam role), and pane recording (GUI video record role)."""

import json
import os
import urllib.request

import numpy as np

from denseslam_tpu.io.viewer import LiveViewer, _OrbitCam


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.read()


def test_orbit_cam_pose_orthonormal_and_looks_at_target():
    cam = _OrbitCam()
    cam.nav(daz=0.7, delv=-0.3, scale=1.5)
    cam.target = np.array([3.0, -1.0, 12.0])
    T = cam.pose()
    R = T[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert np.linalg.det(R) > 0.99
    # camera z axis (forward) points from eye to target at distance radius
    to_tgt = cam.target - T[:3, 3]
    assert np.allclose(to_tgt / np.linalg.norm(to_tgt), R[:, 2], atol=1e-9)
    assert abs(np.linalg.norm(to_tgt) - cam.radius) < 1e-9
    # y-down convention: camera y has a non-negative world-y component
    assert T[1, 1] >= 0.0


def test_nav_clamps_and_pan_breaks_follow():
    cam = _OrbitCam()
    cam.nav(delv=99.0)
    assert abs(cam.el) <= 1.45
    cam.nav(scale=1e9)
    assert cam.radius <= 500.0
    assert cam.follow
    cam.nav(dpx=0.1)
    assert not cam.follow
    cam.nav(reset=True)
    assert cam.follow and cam.dirty


def test_viewer_freeview_and_record_roundtrip(tmp_path):
    v = LiveViewer(port=0, record_dir=str(tmp_path))
    try:
        # follow mode: pushing a moving pose dirties the free camera
        T = np.eye(4)
        T[:3, 3] = [1.0, 0.0, 5.0]
        v.update(pose=T)
        assert v.freeview_pose() is None     # nobody watching yet
        _get(v.port, "/state")               # a dashboard client appears
        T2 = T.copy()
        T2[:3, 3] = [2.0, 0.0, 6.0]
        v.update(pose=T2)                    # camera moved -> dirty
        fvT = v.freeview_pose()
        assert fvT is not None and fvT.shape == (4, 4)
        assert v.freeview_pose() is None          # not dirty twice

        # nav over HTTP dirties it again and changes the pose
        _get(v.port, "/freeview/nav?daz=0.5&scale=0.8")
        fvT2 = v.freeview_pose()
        assert fvT2 is not None
        assert not np.allclose(fvT2, fvT)

        # record two freeview frames to an .avi
        msg = json.loads(_get(v.port, "/record?action=start&pane=freeview"))
        assert msg["recording"] == "freeview"
        img = (np.random.default_rng(0).random((60, 80)) * 255)
        v.update(panes={"freeview": img})
        v.update(panes={"freeview": img * 0.5})
        v.update(panes={"other": img})            # not the recorded pane
        st = json.loads(_get(v.port, "/state"))
        assert st["recording"] == "freeview"
        assert st["recorded_frames"] == 2
        assert st["freeview"]["follow"] is True
        path = msg["path"]
        json.loads(_get(v.port, "/record?action=stop"))
        assert os.path.exists(path) and os.path.getsize(path) > 0

        # pane fetch still works
        assert _get(v.port, "/pane/freeview")[:4] == b"\x89PNG"
        assert b"freeview" in _get(v.port, "/")
    finally:
        v.close()


def test_draw_flow_renders_vectors():
    """Scene-flow pane (reference GUI matched-flow overlay,
    DenseSLAMGUI.cpp:216-220): valid prev->curr matches draw as
    line+dot; invalid ones leave the image untouched."""
    import numpy as np

    from denseslam_tpu.io.viewer import draw_flow

    img = np.zeros((40, 60), np.float32)
    uv_prev = np.array([[10.0, 10.0], [50.0, 30.0]])
    uv_curr = np.array([[20.0, 12.0], [40.0, 28.0]])
    valid = np.array([True, False])
    out = draw_flow(img, uv_prev, uv_curr, valid)
    assert out.shape == (40, 60, 3) and out.dtype == np.uint8
    assert out[:20, 5:25].any(), "valid match vector not drawn"
    # the invalid match's endpoint stays black
    assert not out[26:30, 38:42].any()
