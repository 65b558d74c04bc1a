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


def test_unknown_key_warns(tmp_path):
    # Reference behavior analogue: Config::get_ THROWS on a missing key
    # (config.cpp:31-37) so a typo'd key fails loudly; with defaults-based
    # loading the equivalent safety is an unknown-key warning (VERDICT r4
    # missing #3).
    import warnings

    p = tmp_path / "c.yaml"
    p.write_text("min_triang_angel: 2.0\n")  # typo'd min_triang_angle
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cfg = load_config(p)
    assert any("min_triang_angel" in str(w.message) for w in rec)
    assert cfg.triang.min_triang_angle_deg == 1.0  # default untouched


def test_unknown_section_key_warns(tmp_path):
    import warnings

    p = tmp_path / "c.yaml"
    p.write_text(
        "dataset_name: d\nd:\n  dataset_dir: x\n  camera_info.f: 600\n")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        load_config(p)
    assert any("camera_info.f" in str(w.message) for w in rec)


def test_missing_dataset_section_raises(tmp_path):
    # The reference exits on a missing section (yaml.cpp:58-71).
    import pytest

    p = tmp_path / "c.yaml"
    p.write_text("dataset_name: nope\nmatlab:\n  dataset_dir: x\n")
    with pytest.raises(KeyError):
        load_config(p)


def test_reference_config_loads_clean(tmp_path):
    """The reference's own full config key set must load without warnings
    (every key is either consumed or documented accepted-and-ignored)."""
    import warnings

    text = """%YAML:1.0
dataset_name: "matlab"
matlab:
  dataset_dir: data/imgs
  num_images: 150
  camera_info.fx: 615
  camera_info.fy: 615
  camera_info.cx: 320
  camera_info.cy: 240
  is_draw_true_traj: "true"
  true_traj_filename: data/test_data/cam_traj_truth.txt
fr1_desk:
  dataset_dir: /somewhere
  num_images: 150
  camera_info.fx: 517.3
  camera_info.fy: 516.5
  camera_info.cx: 325.1
  camera_info.cy: 249.7
  is_draw_true_traj: "false"
max_num_imgs_to_proc: 300
is_pcl_wait_for_keypress: "false"
cv_waitkey_time: 1
save_predicted_traj_to: data/test_data/cam_traj.txt
output_folder: "output"
number_of_keypoints_to_extract: 8000
max_number_of_keypoints: 1500
scale_factor: 1.2
level_pyramid: 4
score_threshold: 20
feature_match_method_index_initialization: 1
feature_match_method_index_triangulation: 1
feature_match_method_index_pnp: 1
feature_match_method_index: 3
xiang_gao_method_match_ratio: 2
lowe_method_dist_ratio: 0.8
method_3_feature_dist_threshold: 50.0
max_matching_pixel_dist_in_initialization: 100
max_matching_pixel_dist_in_triangulation: 100
max_matching_pixel_dist_in_pnp: 50
kpts_uniform_selection_grid_size: 16
kpts_uniform_selection_max_pts_per_grid: 8
findEssentialMat_prob: 0.999
findEssentialMat_threshold: 1.0
min_triang_angle: 1.0
max_ratio_between_max_angle_and_median_angle: 20
min_inlier_matches: 15
min_pixel_dist: 50
min_median_triangulation_angle: 2.0
assumed_mean_pts_depth_during_vo_init: 0.8
min_dist_between_two_keyframes: 0.03
max_possible_dist_to_prev_keyframe: 0.3
is_enable_ba: "true"
num_prev_frames_to_opti_by_ba: 5
information_matrix: "1.0 0.0 0.0 1.0"
is_ba_fix_map_points: "true"
"""
    p = tmp_path / "config.yaml"
    p.write_text(text)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cfg = load_config(p)
    assert [str(w.message) for w in rec] == []
    assert cfg.orb.max_keypoints == 1500
