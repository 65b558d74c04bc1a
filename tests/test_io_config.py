"""Tests for trajectory I/O format parity and typed config loading."""

import numpy as np
from scipy.spatial.transform import Rotation

from monocular_visual_odometry_tpu.utils import io as vio
from monocular_visual_odometry_tpu.utils.config import VOConfig, load_config


def test_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    poses = []
    for _ in range(5):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        poses.append(T)
    poses = np.stack(poses)
    p = tmp_path / "traj.txt"
    vio.write_trajectory(p, poses)
    back = vio.read_trajectory(p)
    np.testing.assert_allclose(back, poses, atol=1e-5)


def test_row_order_matches_reference():
    # Reference order: tx ty tz, then the three COLUMNS of R (vo_io.cpp:60-71).
    T = np.arange(16, dtype=np.float64).reshape(4, 4)
    row = vio.pose_to_row(T)
    np.testing.assert_allclose(
        row, [3, 7, 11, 0, 4, 8, 1, 5, 9, 2, 6, 10], atol=0
    )


def test_image_paths_pattern():
    paths = vio.image_paths("/data/x", 3)
    assert paths[0].endswith("rgb_00000.png")
    assert paths[2].endswith("rgb_00002.png")


def test_load_reference_config(tmp_path):
    # A snippet in the reference's own flat format, incl. the %YAML directive
    # and string bools.
    text = """%YAML:1.0
dataset_name: "matlab"
matlab:
  dataset_dir: data/imgs
  num_images: 42
  camera_info.fx: 615
  camera_info.fy: 615
  camera_info.cx: 320
  camera_info.cy: 240
  is_draw_true_traj: "true"
max_num_imgs_to_proc: 300
number_of_keypoints_to_extract: 8000
max_number_of_keypoints: 1500
feature_match_method_index: 3
lowe_method_dist_ratio: 0.8
min_triang_angle: 1.0
is_enable_ba: "true"
is_ba_fix_map_points: "true"
information_matrix: "1.0 0.0 0.0 1.0"
num_prev_frames_to_opti_by_ba: 5
"""
    p = tmp_path / "config.yaml"
    p.write_text(text)
    cfg = load_config(p)
    assert cfg.dataset.num_images == 42
    assert cfg.dataset.fx == 615.0
    assert cfg.dataset.is_draw_true_traj is True
    assert cfg.orb.max_keypoints == 1500
    # float threshold NOT truncated to int (reference quirk fixed, SURVEY §7)
    assert cfg.match.lowe_dist_ratio == 0.8
    assert cfg.ba.enabled is True and cfg.ba.fix_map_points is True
    assert cfg.ba.information_matrix == (1.0, 0.0, 0.0, 1.0)
    assert cfg.ba.window == 5


def test_default_config():
    cfg = VOConfig()
    assert cfg.init.assumed_mean_depth == 0.8
    assert cfg.tracking.min_dist_between_keyframes == 0.03
    assert cfg.orb.grid_size == 16
