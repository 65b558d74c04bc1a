"""True multi-process distributed BA: ≥2 jax processes over the
jax.distributed runtime (BASELINE config 5).

The reference has no communication layer at all (SURVEY.md §2.3 — one
synchronous process, raw-pointer data flow); this module is the
TPU-native equivalent of bringing the windowed BA up across hosts:
``jax.distributed.initialize`` + a global device mesh spanning all
processes + the same ``parallel.dist_ba`` solver, with inputs built as
global arrays (replicated poses/observations, landmark blocks sharded
across processes). On a TPU pod the collectives ride ICI within a slice
and DCN across hosts; in this environment the same program runs on N
processes x 4 virtual CPU devices with gloo collectives — the code path
(global mesh, make_array_from_process_local_data, psum/psum_scatter
across process boundaries) is identical.

Run one process per "host":

    python -m monocular_visual_odometry_tpu.parallel.multihost \
        --process-id 0 --num-processes 2 --coordinator 127.0.0.1:9731 \
        --report /tmp/mh_report.json
    python -m monocular_visual_odometry_tpu.parallel.multihost \
        --process-id 1 --num-processes 2 --coordinator 127.0.0.1:9731

Every process builds the SAME seeded problem, solves it on the global
mesh, and checks the distributed result against the single-device solver
computed locally; process 0 writes a JSON agreement report
(tests/test_multihost.py drives this and gates the numbers;
MULTIHOST_r03.json is the committed artifact).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _parse_args(argv):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="127.0.0.1:9731")
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--report", default=None,
                    help="JSON report path (written by process 0)")
    ap.add_argument("--landmarks", type=int, default=1024)
    ap.add_argument("--obs-per-frame", type=int, default=256)
    ap.add_argument("--iterations", type=int, default=15)
    ap.add_argument("--deterministic", action="store_true",
                    help="f64 accumulation (cfg.ba.deterministic) + x64: the "
                         "dist and single LM follow the same accept/reject "
                         "trajectory, so final costs must agree to <1e-3")
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])

    # Platform setup must precede any backend use. The CPU backend needs
    # gloo collectives for cross-process psum/psum_scatter/all_gather.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_process}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if args.deterministic:
        # must precede any trace: f64 literals are silent f32 without it
        jax.config.update("jax_enable_x64", True)
    from monocular_visual_odometry_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    assert jax.process_count() == args.num_processes, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from monocular_visual_odometry_tpu.models import ba as BA
    from monocular_visual_odometry_tpu.parallel import dist_ba
    from monocular_visual_odometry_tpu.parallel.mesh import POINTS_AXIS
    from monocular_visual_odometry_tpu.parallel.scaling import make_problem
    from monocular_visual_odometry_tpu.utils.config import VOConfig

    cfg = VOConfig()
    cfg = cfg.replace(ba=dataclasses.replace(
        cfg.ba, fix_map_points=False, window=5, iterations=args.iterations,
        deterministic=args.deterministic))
    if args.deterministic:
        assert jnp.zeros(1, jnp.float64).dtype == jnp.float64, (
            "x64 must be enabled for --deterministic")
    # every process builds the identical seeded problem (host numpy)
    prob, cam = make_problem(W=5, K=args.obs_per_frame, M=args.landmarks)
    prob_np = jax.tree.map(np.asarray, prob)

    # single-device reference, local to each process
    T_ref, pts_ref, c_ref = jax.tree.map(
        np.asarray, BA.ba_solve(cfg, cam, jax.tree.map(jnp.asarray, prob_np)))

    # global mesh over every device of every process
    mesh = Mesh(np.asarray(jax.devices()), (POINTS_AXIS,))
    D = mesh.size

    def make_global(x, spec):
        sh = NamedSharding(mesh, spec)
        if spec == P():
            local = x
        elif spec == P(POINTS_AXIS):
            rows = x.shape[0] // jax.process_count()
            local = x[args.process_id * rows:(args.process_id + 1) * rows]
        else:  # P(None, POINTS_AXIS)
            cols = x.shape[1] // jax.process_count()
            local = x[:, args.process_id * cols:(args.process_id + 1) * cols]
        return jax.make_array_from_process_local_data(sh, local, x.shape)

    gprob = BA.BAProblem(
        T_c_w=make_global(prob_np.T_c_w, P()),
        obs_uv=make_global(prob_np.obs_uv, P(None, POINTS_AXIS)),
        obs_pid=make_global(prob_np.obs_pid, P(None, POINTS_AXIS)),
        obs_valid=make_global(prob_np.obs_valid, P(None, POINTS_AXIS)),
        pts=make_global(prob_np.pts, P(POINTS_AXIS)),
        pt_used=make_global(prob_np.pt_used, P(POINTS_AXIS)),
        frame_valid=make_global(prob_np.frame_valid, P()),
    )

    solve = dist_ba.make_dist_ba(cfg, cam, mesh)
    T_d, pts_d, c_d = solve(gprob)
    jax.block_until_ready(T_d)

    # replicated outputs are addressable everywhere; gather the sharded
    # landmark blocks across processes for the agreement check
    T_d_np = np.asarray(jax.device_get(T_d.addressable_shards[0].data))
    c_d_np = np.asarray(jax.device_get(c_d.addressable_shards[0].data))
    pts_d_np = np.asarray(multihost_utils.process_allgather(pts_d, tiled=True))

    used = prob_np.pt_used
    pose_err = float(np.abs(T_d_np - T_ref).max())
    pt_err = float(np.abs(pts_d_np[used] - pts_ref[used]).max())

    # optimization-quality gate under ONE evaluator: robust cost of each
    # solution on the full local problem. (The two solvers' own reported
    # final costs sit at the noise floor where a 3e-4 pose difference
    # moves the per-obs cost ~10% — comparing them directly measures cost
    # curvature, not solver agreement.)
    info = jnp.asarray(cfg.ba.information_matrix, jnp.float32).reshape(2, 2)

    def robust_cost(T, pts):
        p = prob._replace(T_c_w=jnp.asarray(T), pts=jnp.asarray(pts))
        r, _, _ = BA._residuals_and_jacobians(p, cam, info)
        w = BA._robust_weights(r, p.obs_valid, info, cfg.ba.huber_delta)
        e2 = (r[..., 0] ** 2 * info[0, 0] + r[..., 1] ** 2 * info[1, 1]
              + 2.0 * r[..., 0] * r[..., 1] * info[0, 1])
        return float(jnp.sum(w * e2) / jnp.maximum(jnp.sum(p.obs_valid), 1))

    cost_at_single = robust_cost(T_ref, pts_ref)
    cost_at_dist = robust_cost(T_d_np, pts_d_np)
    cost_rel = float(abs(c_d_np[-1] - c_ref[-1]) / max(abs(c_ref[-1]), 1e-12))
    report = {
        "num_processes": jax.process_count(),
        "devices_per_process": args.devices_per_process,
        "global_devices": D,
        "backend": jax.default_backend(),
        "collectives": "gloo",
        "problem": {"window": 5, "obs_per_frame": args.obs_per_frame,
                    "landmarks": args.landmarks,
                    "lm_iterations": args.iterations, "mode": "joint",
                    "deterministic": bool(args.deterministic)},
        "pose_err_vs_single_device": pose_err,
        "point_err_vs_single_device": pt_err,
        "cost_of_single_solution": cost_at_single,
        "cost_of_distributed_solution": cost_at_dist,
        "final_cost_rel_err": cost_rel,
        "final_cost_single": float(c_ref[-1]),
        "final_cost_distributed": float(c_d_np[-1]),
    }
    print(f"[proc {args.process_id}] {json.dumps(report)}", flush=True)
    if args.process_id == 0 and args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
    # orderly shutdown so the coordinator does not flag a crash
    multihost_utils.sync_global_devices("mvo_multihost_done")
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
