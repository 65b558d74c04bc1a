"""Metrics / logging / per-stage timing.

The reference's observability is printf sprinkled through the pipeline
(SURVEY.md §5.5); here the per-frame diagnostics come back as data
(models.state.StepOutput) and this module renders them plus wall-clock
stage timings. ``jax.profiler`` tracing can be toggled for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    """Accumulates wall-clock per named stage; prints a summary table."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [f"{'stage':<24}{'calls':>8}{'total_s':>10}{'mean_ms':>10}"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:<24}{n:>8}{tot:>10.3f}{tot / max(n,1) * 1e3:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def jax_trace(log_dir: str | None):
    """Wrap a block in a jax.profiler trace when ``log_dir`` is set."""
    import jax

    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield


def format_step(frame_idx: int, out) -> str:
    """One-line per-frame banner (the reference's printf block,
    vo_addFrame.cpp:21-22 et al.)."""
    stage_names = {0: "BLANK", 1: "INIT", 2: "TRACK"}
    return (
        f"frame {frame_idx:4d} [{stage_names.get(int(out.stage), '?'):5s}] "
        f"kpts={int(out.n_keypoints):4d} matches={int(out.n_matches):4d} "
        f"inliers={int(out.n_inliers):4d} map={int(out.n_map_points):4d} "
        f"{'KF' if bool(out.is_keyframe) else '  '} "
        f"{'ok' if bool(out.tracking_ok) else 'TRACK-FAIL'}"
    )
