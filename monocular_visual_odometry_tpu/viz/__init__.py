"""Visualization (replaces the reference's interactive PCL/OpenCV windows,
SURVEY.md §8.1): trajectory plots and annotated frames exported as image
files, plus the standalone interactive HTML viewer (``viz.viewer``) — the
keypress-controlled live-viewer analogue (run_vo.cpp:317-323)."""

from monocular_visual_odometry_tpu.viz.viewer import export_viewer  # noqa: F401
