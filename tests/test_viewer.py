"""viz.viewer: the standalone interactive HTML viewer (the live-PclViewer
analogue, run_vo.cpp:317-323 / pcl_display.cpp:41-50)."""

import json
import re

import numpy as np
import pytest

from monocular_visual_odometry_tpu.viz.viewer import export_viewer


def _traj(n):
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, 0, 3] = np.linspace(0, 1, n)
    T[:, 2, 3] = np.linspace(0, 0.5, n)
    return T


def _embedded_data(html):
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    assert m, "embedded data object not found"
    return json.loads(m.group(1))


def test_export_viewer_embeds_all_streams(tmp_path):
    est = _traj(12)
    gt = _traj(12)
    mp = np.random.default_rng(0).normal(size=(50, 3))
    gray = np.linspace(0, 255, 50)
    created = np.concatenate([np.zeros(40), np.full(10, 7)])
    out = export_viewer(est, gt, map_pts=mp, map_gray=gray,
                        map_created_idx=created,
                        keyframe_indices=np.array([0, 4, 9]),
                        out_path=str(tmp_path / "viewer.html"))
    html = open(out).read()
    assert "<canvas" in html and "keydown" in html and "ArrowRight" in html
    d = _embedded_data(html)
    assert len(d["est"]) == 12 and len(d["gt"]) == 12
    assert len(d["map"]) == 50 and len(d["gray"]) == 50
    # newest creation batch flagged fresh (drawn red, updateCurrPoints)
    assert sum(d["fresh"]) == 10
    assert d["kf"] == [0, 4, 9]
    # per-frame rotation for the frustum glyph
    assert len(d["pose"]) == 12 and len(d["pose"][0]) == 9


def test_export_viewer_minimal_inputs(tmp_path):
    out = export_viewer(_traj(3), out_path=str(tmp_path / "v.html"))
    d = _embedded_data(open(out).read())
    assert len(d["est"]) == 3 and d["map"] == [] and d["gt"] == []


def test_export_viewer_rejects_empty():
    with pytest.raises(ValueError):
        export_viewer(np.zeros((0, 4, 4)))
