"""Tests for the CLI driver, checkpointing, metrics and viz exports."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.utils import metrics
from monocular_visual_odometry_tpu.utils.checkpoint import load_state, save_state
from monocular_visual_odometry_tpu.utils.config import VOConfig


def test_checkpoint_roundtrip(tmp_path):
    import jax

    st = S.init_state(VOConfig())
    st = st._replace(frame_idx=st.frame_idx + 7,
                     T_w_c=st.T_w_c.at[0, 3].set(1.5))
    p = str(tmp_path / "state.npz")
    save_state(p, st)
    back = load_state(p, S.init_state(VOConfig()))
    assert int(back.frame_idx) == 7
    assert float(back.T_w_c[0, 3]) == 1.5
    for a, b in zip(jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ate_alignment_invariances():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    gt = np.tile(np.eye(4), (20, 1, 1))
    gt[:, :3, 3] = np.cumsum(rng.normal(0, 0.1, (20, 3)), axis=0)
    # a scaled/rotated/shifted copy must align to ~0 ATE under sim3
    R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix()
    est = gt.copy()
    est[:, :3, 3] = 2.5 * gt[:, :3, 3] @ R.T + [1, 2, 3]
    assert metrics.ate_rmse(est, gt, "sim3") < 1e-9
    # scale-only alignment handles pure scaling
    est2 = gt.copy()
    est2[:, :3, 3] = 0.3 * gt[:, :3, 3]
    assert metrics.ate_rmse(est2, gt, "scale") < 1e-9
    # and a genuinely different trajectory does not align to zero
    est3 = gt.copy()
    est3[:, :3, 3] = gt[:, :3, 3] + rng.normal(0, 0.2, (20, 3))
    assert metrics.ate_rmse(est3, gt, "sim3") > 0.05


def test_viz_exports(tmp_path):
    from monocular_visual_odometry_tpu.viz import draw, trajectory

    est = np.tile(np.eye(4), (10, 1, 1))
    est[:, 2, 3] = np.arange(10) * 0.1
    p = trajectory.plot_trajectory(est, est, np.zeros((5, 3)),
                                   out_path=str(tmp_path / "t.png"))
    assert os.path.exists(p) and os.path.getsize(p) > 1000

    img = np.full((60, 80), 100, np.uint8)
    kpts = np.asarray([[10.0, 10.0], [40.0, 30.0]])
    rgb = draw.draw_frame(img, kpts, np.asarray([True, True]),
                          np.asarray([True, False]),
                          out_path=str(tmp_path / "f.png"))
    assert rgb.shape == (60, 80, 3)
    assert (rgb[10, 8] == [255, 0, 0]).all()    # inlier: red
    assert (rgb[30, 38] == [0, 255, 0]).all()   # plain keypoint: green
    assert os.path.exists(tmp_path / "f.png")


def test_animated_trajectory_export(tmp_path):
    """Incremental GIF (the reference demo-GIF analogue, README.md:216-234):
    multi-frame, map points appear no earlier than their creation frame."""
    from PIL import Image

    from monocular_visual_odometry_tpu.viz import trajectory

    n = 24
    est = np.tile(np.eye(4), (n, 1, 1))
    est[:, 0, 3] = np.linspace(0, 2, n)
    est[:, 2, 3] = np.linspace(0, 3, n)
    mp = np.random.default_rng(0).uniform(-1, 4, (50, 3))
    created = np.random.default_rng(1).integers(0, n, 50)
    p = trajectory.animate_trajectory(
        est, est, mp, created, out_path=str(tmp_path / "t.gif"),
        max_anim_frames=12)
    im = Image.open(p)
    assert im.n_frames >= 12
    assert os.path.getsize(p) > 5000


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    """Drive the actual CLI process on a short synthetic sequence."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "monocular_visual_odometry_tpu.cli",
         "--synthetic", "--frames", "12", "--output", str(tmp_path), "--cpu"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads((tmp_path / "report.json").read_text())
    assert report["frames"] == 12
    assert os.path.exists(tmp_path / "cam_traj.txt")
    assert os.path.exists(tmp_path / "trajectory.png")
    # trajectory file re-reads in the reference format
    from monocular_visual_odometry_tpu.utils import io as vio

    traj = vio.read_trajectory(tmp_path / "cam_traj.txt")
    assert traj.shape == (12, 4, 4)
