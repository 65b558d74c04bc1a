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


_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2,
                "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1}


def collective_inventory(hlo_text: str, n: int) -> dict:
    """Scan compiled SPMD HLO for collective instructions and convert their
    RESULT shapes to per-device bytes moved over the interconnect, using
    standard ring-algorithm factors:

    - all-reduce on B result bytes      -> 2 * B * (N-1)/N  sent per device
    - all-gather producing B_full bytes ->     B_full * (N-1)/N
    - reduce-scatter with B_shard result->     B_shard * (N-1)
    - collective-permute                ->     B

    NOTE on loop bodies: collectives inside the LM scan appear ONCE in the
    HLO while-body but execute once per iteration — this inventory is the
    *static* op list used to verify the analytic per-iteration model in
    comm_model(), not a total-traffic counter by itself.

    Async backends: one logical collective lowers to a -start/-done pair;
    only the -start op is counted (the -done is excluded by the regex).
    A -start's result tuple may alias the operand, so treat per-op bytes
    from async HLO as an upper bound; the analytic model in comm_model()
    is the precise account and this inventory is its cross-check on the
    sync CPU-mesh HLO."""
    import re

    factors = {
        "all-reduce": lambda b: 2.0 * b * (n - 1) / n,
        "all-gather": lambda b: b * (n - 1) / n,
        "reduce-scatter": lambda b: b * (n - 1),
        "collective-permute": lambda b: float(b),
    }
    # \b(?!-) anchors the op name: async backends (TPU) emit
    # all-reduce-start / all-reduce-done PAIRS for one logical collective;
    # matching the bare prefix would count each pair twice (ADVICE r4).
    # -start ops carry the operand/result shapes, -done ops are counted as
    # zero-byte bookkeeping via the (?!-done) exclusion of -start only.
    pat = re.compile(
        r"=\s*(\([^)]*\)|[a-z0-9]+\[[0-9,]*\]\S*)\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
        r"(?:-start)?\b(?!-)")
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    ops = []
    for m in pat.finditer(hlo_text):
        shapes, op = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in shape_pat.findall(shapes):
            if dt not in _DTYPE_BYTES:
                continue
            el = 1
            for d in dims.split(","):
                if d:
                    el *= int(d)
            nbytes += el * _DTYPE_BYTES[dt]
        ops.append({"op": op, "result_bytes": nbytes,
                    "bytes_moved_per_device": round(factors[op](nbytes), 1)})
    return {"n_collectives": len(ops), "ops": ops}


def comm_model(W: int = 5, K: int = 1024, M: int = 4096,
               n: int = 8) -> dict:
    """Analytic per-LM-iteration interconnect bytes per device for the
    dist_ba partition (observation columns + landmark blocks sharded on a
    size-n mesh), with the ring factors above. Mirrors parallel.dist_ba's
    collective schedule term by term; verified against the compiled-HLO
    inventory (collective_inventory). VERDICT r3 weak #5: the >=80%
    BASELINE target needs communication accounting, not just a FLOPs
    partition that is trivially ~1.0."""
    f_ar = 2.0 * (n - 1) / n
    f_ag = (n - 1) / n
    f_rs_full = (n - 1) / n          # applied to the FULL pre-scatter size
    joint = {
        # evaluate(): full_pts all-gather [M,3] f32
        "all_gather_pts": 12 * M * f_ag,
        # psum cost scalar + H_cc [W,6,6] + g_c [W,6]
        "psum_cost_Hg": (4 + 144 * W + 24 * W) * f_ar,
        # psum_scatter A [M,3,3], b [M,3], U [W,M,6,3] (full sizes)
        "psum_scatter_A_b_U": (36 * M + 12 * M + 72 * W * M) * f_rs_full,
        # build_step(): psum S_off [W,W,6,6] + g_corr [W,6]
        "psum_schur": (144 * W * W + 24 * W) * f_ar,
    }
    joint["total_per_iteration"] = sum(joint.values())
    fix = {
        # pts never change in fix mode -> the all-gather is loop-invariant
        # (hoisted out of the scan); per iteration only the camera Gram
        # psums remain
        "psum_cost_Hg": (4 + 144 * W + 24 * W) * f_ar,
        "all_gather_pts_once": 12 * M * f_ag,
    }
    fix["total_per_iteration"] = fix["psum_cost_Hg"]
    return {"mesh": n, "window": W, "obs_per_frame": K, "landmarks": M,
            "joint_mode_bytes": {k: round(v, 1) for k, v in joint.items()},
            "fix_points_bytes": {k: round(v, 1) for k, v in fix.items()}}


def measure_comm(W=5, K=1024, M=4096, n=8, iterations=20) -> dict:
    """Full communication-vs-compute account at the live shape: analytic
    per-iteration bytes (comm_model), HLO collective inventory as the
    cross-check, per-device FLOPs from XLA cost analysis, and the derived
    bandwidth requirement for the BASELINE >=80% efficiency target."""
    # points_mesh silently truncates to the available devices; without the
    # host-platform flag a 1-device mesh would "cross-check" the n-device
    # analytic model against an empty collective inventory (ADVICE r4).
    if len(jax.devices()) < n:
        raise RuntimeError(
            f"measure_comm(n={n}) needs >= {n} devices, found "
            f"{len(jax.devices())}; run with XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n} JAX_PLATFORMS=cpu")
    cfg = VOConfig()
    cfg = cfg.replace(ba=dataclasses.replace(
        cfg.ba, fix_map_points=False, window=W, iterations=iterations))
    prob, cam = make_problem(W=W, K=K, M=M)
    mesh = points_mesh(n)
    solve = dist_ba.make_dist_ba(cfg, cam, mesh)
    compiled = jax.jit(solve).lower(prob).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_dev = float(ca.get("flops", float("nan"))) if ca else float("nan")
    inv = collective_inventory(compiled.as_text(), n)
    model = comm_model(W=W, K=K, M=M, n=n)
    bytes_it = model["joint_mode_bytes"]["total_per_iteration"]
    # XLA cost analysis counts the scan body once, so flops_dev is one
    # iteration's work plus the outside-loop parts — the same granularity
    # as bytes_it; their ratio is the partition's comm intensity.
    intensity = bytes_it / flops_dev if flops_dev else float("nan")
    # efficiency model: eff = t_comp/(t_comp + t_comm)
    #   = 1 / (1 + intensity * R / Bw)  for compute rate R (FLOP/s/device)
    #   and all-reduce bandwidth Bw (B/s/device); >=80% needs
    #   Bw >= 4 * intensity * R.
    # R_measured: the single-chip windowed BA achieves ~1e9 FLOP/s on this
    # kernel class (2.7 ms for 2.7 MFLOP, BENCH_r04_preview); take a 10x
    # headroom on top of that for the estimate.
    R_meas, R_opt = 1e9, 1e10
    out = {
        "problem": model,
        "flops_per_device_per_iteration_est": flops_dev,
        "bytes_per_device_per_iteration": bytes_it,
        "comm_intensity_bytes_per_flop": round(intensity, 3),
        "hlo_collective_inventory": inv,
        "efficiency_model": {
            "formula": "eff = 1/(1 + intensity*R/Bw); 80% needs Bw >= 4*intensity*R",
            "Bw_needed_for_80pct_at_R_measured_1e9": f"{4 * intensity * R_meas / 1e9:.1f} GB/s",
            "Bw_needed_for_80pct_at_R_10x_headroom_1e10": f"{4 * intensity * R_opt / 1e9:.1f} GB/s",
            "v5e_ici_reference": "~180 GB/s/chip usable all-reduce bandwidth "
                                 "(2D torus, public v5e figures)",
        },
    }
    return out


if __name__ == "__main__":
    out = measure()
    out_comm = measure_comm()
    print(json.dumps({"flops_partition": out, "communication": out_comm},
                     indent=2))
