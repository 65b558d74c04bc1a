"""The FULL python_tools preprocessing chain, load-bearing end-to-end
(VERDICT r4 next #6, final clause: "the calibration tool's K feeding the
pipeline config would make the whole python_tools chain load-bearing").

Reference workflow being mirrored (README.md:190-208 + python_tools/):

    1. calibrate_camera.py  -> K + distortion from chessboard views
    2. undistort_all_images.py -> undistort the raw camera frames
    3. run_vo with the calibrated K, assuming pinhole images

Here: synthetic chessboard views are projected through a TRUE camera
(K_gt + radial distortion), `data.tools.calibrate_camera` recovers
K̂/dist̂ from them, raw frames are SIMULATED by distorting ideal renders
with the TRUE parameters, undistorted with the CALIBRATED parameters,
and tracked with the CALIBRATED intrinsics in the pipeline config. The
final ATE gate fails if any stage of the chain (calibration accuracy,
undistortion, config plumbing) breaks.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.data import tools
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.vo import run_sequence
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.utils import metrics
from monocular_visual_odometry_tpu.utils.config import VOConfig

K_GT = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1.0]])
DIST_GT = np.array([-0.28, 0.09])
N = 40


def _chessboard_views(K, dist, n_views=10, seed=0):
    """Project a chessboard through the TRUE camera from several poses
    (the correspondences cv2.findChessboardCorners would provide)."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    obj = tools.chessboard_object_points((8, 6), square=0.03)
    objs, imgs = [], []
    for _ in range(n_views):
        Rm = Rotation.from_euler(
            "xyz", rng.uniform(-0.5, 0.5, 3)).as_matrix()
        t = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                      rng.uniform(0.4, 0.8)])
        P = np.concatenate([obj, np.zeros((len(obj), 1))], axis=1)
        pc = P @ Rm.T + t
        xy = pc[:, :2] / pc[:, 2:3]
        r2 = (xy ** 2).sum(1, keepdims=True)
        xy_d = xy * (1 + dist[0] * r2 + dist[1] * r2 ** 2)
        uv = xy_d @ K[:2, :2].T + K[:2, 2]
        objs.append(obj)
        imgs.append(uv)
    return objs, imgs


def test_calibrate_undistort_track_chain():
    # 1. calibrate from chessboard views seen through the TRUE camera
    objs, imgs = _chessboard_views(K_GT, DIST_GT)
    K_cal, dist_cal, rms = tools.calibrate_camera(objs, imgs, (640, 480))
    assert rms < 0.1, rms
    assert abs(K_cal[0, 0] - K_GT[0, 0]) < 3.0, K_cal

    # 2. simulate the raw camera: ideal renders distorted with the TRUE
    #    parameters; undistort with the CALIBRATED ones
    gt = syn.make_trajectory(N, seed=0, translation_step=0.05)
    scene = syn.default_scene(0)
    raw = [tools.distort_image(
        syn.render_frame(gt[i], scene, K_GT).astype(np.float64), K_GT,
        DIST_GT) for i in range(N)]
    frames = np.stack([tools.undistort_image(f, K_cal, dist_cal)
                       for f in raw]).astype(np.float32)

    # 3. track with the CALIBRATED intrinsics in the config
    cfg = VOConfig()
    cfg = cfg.replace(dataset=dataclasses.replace(
        cfg.dataset, fx=float(K_cal[0, 0]), fy=float(K_cal[1, 1]),
        cx=float(K_cal[0, 2]), cy=float(K_cal[1, 2])))
    cam = Camera.create(cfg.dataset.fx, cfg.dataset.fy,
                        cfg.dataset.cx, cfg.dataset.cy)
    final, outs = run_sequence(cfg, cam, S.init_state(cfg),
                               jnp.asarray(frames), height=480, width=640)
    est = np.asarray(outs.T_w_c)
    assert np.isfinite(est).all()
    assert int(np.asarray(final.stage)) == S.STAGE_TRACKING
    length = metrics.trajectory_length(gt)
    ate = float(metrics.ate_rmse(est, gt, "sim3") / length * 100)
    # clean 40-frame baseline is ~2.7%; the full chain must land near it
    assert ate < 6.0, ate
