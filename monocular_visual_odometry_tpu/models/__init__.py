"""The VO pipeline: fixed-capacity state pytrees, the per-frame step
functions (init / tracking / keyframe update), and windowed bundle
adjustment."""
