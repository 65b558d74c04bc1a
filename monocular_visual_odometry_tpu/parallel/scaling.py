"""Scaling-efficiency measurement for the distributed windowed BA.

BASELINE.md config 5 asks for >=80% scaling efficiency at N>=2 on the
sharded BA. Real multi-chip hardware is not available in this environment
(one tunneled TPU chip), so this harness measures two honest proxies on a
virtual N-device CPU mesh:

- **per-device compiled FLOPs** (XLA cost analysis of the SPMD program):
  efficiency_flops = flops(1) / (N * flops_per_device(N)). This captures
  exactly what sharding is supposed to buy — a 1/N split of the per-point
  Schur work — plus whatever redundant/collective work the partition adds.
  It is hardware-independent and transfers to a real pod.
- **wall clock** on the virtual mesh, reported for completeness but NOT a
  scaling signal on this 2-core host (all N virtual devices share the same
  cores, so ideal scaling shows ~flat wall time, not 1/N).

Problem shape mirrors the live pipeline at map capacity: window 5,
K=1024 observations/frame, M=4096 landmarks, 20 LM iterations, joint
mode — the regime the distribution exists for. With both the observation
axis and the landmark blocks sharded (parallel.dist_ba), the only
replicated FLOPs left are the [6W,6W] solve and the pose retraction, so
the FLOPs efficiency at the live shape is ~1.0 at N=8 (it was 0.537 when
only the landmark blocks were sharded, SCALING_r02.json).
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.models import ba as BA
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.parallel import dist_ba
from monocular_visual_odometry_tpu.parallel.mesh import points_mesh
from monocular_visual_odometry_tpu.utils.config import VOConfig


def make_problem(W: int = 5, K: int = 1024, M: int = 4096, seed: int = 0):
    """A realistic windowed-BA problem: M landmarks in a slab, W cameras
    on a short baseline, every frame observing K points with 0.5px noise."""
    rng = np.random.default_rng(seed)
    cam = Camera.create(615.0, 615.0, 320.0, 240.0)
    pts = np.stack([rng.uniform(-2, 2, M), rng.uniform(-1.5, 1.5, M),
                    rng.uniform(3, 9, M)], axis=1).astype(np.float32)
    T_c_w = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
    for w in range(W):
        T_c_w[w, 0, 3] = -0.06 * w
        T_c_w[w, 1, 3] = 0.02 * np.sin(w)
    obs_pid = rng.integers(0, M, size=(W, K)).astype(np.int32)
    p = (np.einsum("wij,wkj->wki", T_c_w[:, :3, :3], pts[obs_pid])
         + T_c_w[:, None, :3, 3])
    uv = p[..., :2] / p[..., 2:3] * 615.0 + np.asarray([320.0, 240.0])
    uv += rng.normal(0, 0.5, uv.shape)
    pt_used = np.zeros(M, bool)
    pt_used[np.unique(obs_pid)] = True
    # perturb the initial state so the solver does real work
    pts_init = pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)
    prob = BA.BAProblem(
        T_c_w=jnp.asarray(T_c_w), obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_pid=jnp.asarray(obs_pid), obs_valid=jnp.ones((W, K), bool),
        pts=jnp.asarray(pts_init.astype(np.float32)),
        pt_used=jnp.asarray(pt_used), frame_valid=jnp.ones(W, bool),
    )
    return prob, cam


def measure(n_devices_list=(1, 2, 8), W=5, K=1024, M=4096, iterations=20,
            reps=3) -> dict:
    """Compile the distributed solver on meshes of each size; report
    per-device FLOPs from XLA cost analysis and median wall clock."""
    cfg = VOConfig()
    cfg = cfg.replace(ba=dataclasses.replace(
        cfg.ba, fix_map_points=False, window=W, iterations=iterations))
    prob, cam = make_problem(W=W, K=K, M=M)

    results = {}
    for n in n_devices_list:
        if n > len(jax.devices()):
            continue
        mesh = points_mesh(n)
        solve = dist_ba.make_dist_ba(cfg, cam, mesh)
        lowered = jax.jit(solve).lower(prob)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan"))) if ca else float("nan")
        jax.block_until_ready(solve(prob))   # warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(solve(prob))
            times.append(time.perf_counter() - t0)
        results[n] = {"flops_per_device": flops,
                      "wall_s_median": float(np.median(times))}

    if 1 in results and np.isfinite(results[1]["flops_per_device"]):
        base = results[1]["flops_per_device"]
        for n, r in results.items():
            r["efficiency_flops"] = base / (n * r["flops_per_device"])
    out = {
        "problem": {"window": W, "obs_per_frame": K, "landmarks": M,
                    "lm_iterations": iterations, "mode": "joint"},
        "backend": jax.default_backend(),
        "note": ("efficiency_flops = flops(1)/(N*flops_per_device(N)) from "
                 "XLA cost analysis of the SPMD partition; wall clock on a "
                 "virtual CPU mesh is NOT a scaling signal (shared cores)"),
        "results": {str(k): v for k, v in results.items()},
    }
    return out


if __name__ == "__main__":
    print(json.dumps(measure(), indent=2))
