"""Long-run accuracy guard: 150 frames (the reference's configured
sequence length, config/config.yaml:15) through the full VO+BA pipeline.

Exists so single-frame perf work cannot silently trade long-run accuracy
away: the ATE and end-drift budgets here were set from the measured state
at round 2 (TPU: ATE 0.192, CPU close) with ~50% headroom.
"""

import numpy as np
import pytest

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.vo import run_sequence, VOEngine
from monocular_visual_odometry_tpu.utils import metrics
from monocular_visual_odometry_tpu.utils.config import VOConfig

import jax.numpy as jnp


@pytest.mark.slow
def test_150_frame_accuracy_budget():
    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    gt = syn.make_trajectory(150, seed=0, translation_step=0.05)
    frames = np.stack([
        syn.render_frame(gt[i], planes, K).astype(np.float32)
        for i in range(150)])

    cfg = VOConfig()
    eng = VOEngine(cfg, 480, 640)
    st0 = S.init_state(cfg)
    final, outs = run_sequence(cfg, eng.cam, st0, jnp.asarray(frames),
                               height=480, width=640)
    est = np.asarray(outs.T_w_c)
    assert np.isfinite(est).all()
    assert int(np.asarray(final.stage)) == S.STAGE_TRACKING

    ate = metrics.ate_rmse(est, gt, "sim3")
    drift = metrics.drift_curve(est, gt)
    length = metrics.trajectory_length(gt)
    # measured at round 3 with the keyframe BA window: ATE ~0.14 on a
    # ~8.0-unit trajectory (1.8%); budget 3% of trajectory length
    assert ate < 0.03 * length, (ate, length)
    # end drift must stay bounded too (the scalar ATE can hide a runaway
    # tail); measured 3.2% with the keyframe window (was 8.75% with the
    # last-5-frames window); budget 5% of length (round-2 verdict item 7)
    assert drift[-1] < 0.05 * length, (drift[-1], length)
