"""Capture a device trace of run_sequence (the bench config-4 path) and
print the top ops by total device time. Working perf tool.
Run: python profile_trace.py [n_frames]"""
import os, sys, glob, gzip, json, time, collections
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax, jax.numpy as jnp, numpy as np
from monocular_visual_odometry_tpu.utils.config import VOConfig
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.vo import run_sequence
from monocular_visual_odometry_tpu.data import synthetic as syn

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
cfg = VOConfig()
cam = Camera.create(cfg.dataset.fx, cfg.dataset.fy, cfg.dataset.cx, cfg.dataset.cy)
planes = syn.default_scene(0)
K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
poses = syn.make_trajectory(n_frames, seed=0, translation_step=0.05)
t0 = time.perf_counter()
frames = np.stack([syn.render_frame(poses[i], planes, K).astype(np.float32)
                   for i in range(n_frames)])
print(f"rendered {n_frames} frames in {time.perf_counter()-t0:.1f}s")
frames_j = jnp.asarray(frames)
st = S.init_state(cfg)

# warm-up compile
t0 = time.perf_counter()
out = run_sequence(cfg, cam, st, frames_j, height=480, width=640)
jax.block_until_ready(out)
print(f"run_sequence compile+first run: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
out = run_sequence(cfg, cam, st, frames_j, height=480, width=640)
jax.block_until_ready(out)
wall = time.perf_counter() - t0
print(f"run_sequence: {wall*1e3:.1f} ms total, {wall/n_frames*1e3:.2f} ms/frame")

tdir = "/tmp/vo_trace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    out = run_sequence(cfg, cam, st, frames_j, height=480, width=640)
    jax.block_until_ready(out)

# find the trace (xplane protobuf or perfetto json)
files = glob.glob(f"{tdir}/**/*.json.gz", recursive=True)
if not files:
    files = glob.glob(f"{tdir}/**/*trace*", recursive=True)
print("trace files:", files)
for f in files:
    if f.endswith(".json.gz"):
        with gzip.open(f) as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        agg = collections.Counter()
        cnt = collections.Counter()
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                name = e.get("name", "?")
                agg[name] += e["dur"]
                cnt[name] += 1
        total = sum(agg.values())
        print(f"{len(events)} events, total {total/1e3:.1f} ms (all tracks)")
        for name, dur in agg.most_common(40):
            print(f"  {dur/1e3:9.2f} ms  x{cnt[name]:<6d} {name[:110]}")
