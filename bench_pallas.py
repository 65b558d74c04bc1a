"""On-TPU micro-benchmark: Pallas streaming Hamming matcher vs the XLA
matmul path, at the two production shapes the pipeline hits every frame
(map-vs-frame PnP matching 4096x1024, keyframe-vs-frame matching
1024x1024).

Decides the Pallas kernel's fate with data (VERDICT r1 item 8): run on a
TPU backend (refuses elsewhere), prints one JSON line per shape, and the
verdict. The recorded result lives in docs/PARITY.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"error": f"needs a TPU backend, got {jax.default_backend()}"}))
        return 1

    from monocular_visual_odometry_tpu.ops import matching as M
    from monocular_visual_odometry_tpu.ops.pallas.hamming import hamming_nn_top2

    rng = np.random.default_rng(0)

    def bench(fn, args, reps=20):
        # pipelined timing (reps back-to-back, one sync): per-call sync on
        # a tunnel-attached chip costs ~20 ms of RPC round trip that
        # swamps a ~1 ms kernel — the r2 'parity' verdict was actually
        # measuring the tunnel on both sides
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(reps)]
            jax.block_until_ready(outs[-1])
            ts.append((time.perf_counter() - t0) / reps)
        return float(np.median(ts)) * 1e3

    @jax.jit
    def xla_path(d1, d2, v1, v2, k1, k2):
        d = M.hamming_matrix(d1, d2, v1, v2)
        r2 = M.pixel_dist2_matrix(k1, k2)
        d = jnp.where(r2 <= 50.0 * 50.0, d, 1e9)
        return M.top2_min(d)

    @jax.jit
    def pallas_path(p1, k1, v1, p2, k2, v2):
        return hamming_nn_top2(p1, k1, v1, p2, k2, v2, jnp.float32(50.0))

    results = {}
    for (K1, K2) in ((4096, 1024), (1024, 1024)):
        d1 = rng.integers(0, 256, (K1, 32)).astype(np.uint8)
        d2 = rng.integers(0, 256, (K2, 32)).astype(np.uint8)
        k1 = rng.uniform(0, 640, (K1, 2)).astype(np.float32)
        k2 = rng.uniform(0, 640, (K2, 2)).astype(np.float32)
        v1 = np.ones(K1, bool)
        v2 = np.ones(K2, bool)
        a = [jnp.asarray(x) for x in (d1, d2, v1, v2, k1, k2)]
        t_xla = bench(xla_path, a)
        print(json.dumps({"progress": f"xla {K1}x{K2}", "ms": round(t_xla, 3)}),
              flush=True)
        p1 = M.unpack_pm1(a[0])
        p2 = M.unpack_pm1(a[1])
        t_pal = bench(pallas_path, (p1, a[4], a[2], p2, a[5], a[3]))
        results[f"{K1}x{K2}"] = {"xla_ms": round(t_xla, 3),
                                 "pallas_ms": round(t_pal, 3),
                                 "speedup_pallas": round(t_xla / t_pal, 2)}
        print(json.dumps({"metric": "hamming_match_ms", "shape": f"{K1}x{K2}",
                          **results[f"{K1}x{K2}"],
                          "device": str(jax.devices()[0])}), flush=True)
    verdict = ("pallas" if all(r["speedup_pallas"] > 1.1 for r in results.values())
               else "xla")
    print(json.dumps({"verdict": verdict, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
