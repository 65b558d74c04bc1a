"""Pallas TPU kernels for the hot ops (SURVEY.md §2.2): streaming Hamming
matching on the MXU, fused FAST/Harris corner response. Each kernel has an
XLA fallback in its caller; interpret mode is used for CPU tests."""
