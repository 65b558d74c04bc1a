"""Stateless TPU-native computer-vision / multi-view-geometry kernels.

Each module replaces a native (OpenCV / g2o / Sophus) kernel of the
reference with a JAX/XLA/Pallas implementation (SURVEY.md §2.2):

- ``lie``            SE(3)/SO(3) exp/log, Rodrigues         (Sophus)
- ``camera``         pinhole model, pixel<->cam transforms  (camera.cpp)
- ``features``       FAST/Harris + oriented BRIEF, grid-K   (cv::ORB)
- ``matching``       bit-packed Hamming matcher on the MXU  (cv matchers)
- ``epipolar``       batched-RANSAC E/H, decompose, triang. (cv calib3d)
- ``scoring``        ORB-SLAM symmetric-transfer E/H scores (motion_estimation.cpp)
- ``pnp``            batched RANSAC-PnP + GN polish         (cv::solvePnPRansac)
"""
