"""Synthetic benchmark scenes with exact ground truth.

The reference is demonstrated on the New Tsukuba sequence (150 frames,
lateral camera motion, ``/root/reference/README.md:214``) which is not
redistributable; this module *generates* an equivalent benchmark: a
multi-plane textured scene rendered by exact ray-plane intersection, with a
smooth 6-DoF camera trajectory and ground truth poses written in the
reference's 12-number trajectory format (``vo_io.cpp:51-77``).

Two flavors:

- :func:`render_sequence` — full images for end-to-end VO (FAST corners come
  from multi-scale noise texture; geometry from 2-4 planes at different
  depths, so both essential-matrix and homography regimes appear).
- :func:`synthesize_two_view` / :func:`synthesize_pnp_scene` — exact 2-D/3-D
  correspondence sets (no rendering) used to unit-test the geometry kernels
  against known poses, mirroring SURVEY.md §4's test strategy.

Everything here is host-side NumPy (offline data prep, like the reference's
``python_tools/``); the TPU never sees this code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Tuple

import numpy as np

from monocular_visual_odometry_tpu.utils import io as vio


# ---------------------------------------------------------------------------
# textures and planes
# ---------------------------------------------------------------------------


def _multiscale_texture(rng: np.random.Generator, size: int = 1024) -> np.ndarray:
    """High-contrast texture with structure at many scales (so FAST finds
    corners at every pyramid level). Returns [size, size] float in [0,1]."""
    tex = np.zeros((size, size), dtype=np.float64)
    for cell in (8, 16, 32, 64):
        n = size // cell
        coarse = rng.uniform(0.0, 1.0, size=(n, n))
        tex += np.kron(coarse, np.ones((cell, cell)))
    tex /= 4.0
    # binarize-ish to sharpen edges -> strong corners
    tex = 0.15 + 0.7 * (tex > 0.5) + 0.15 * tex
    return np.clip(tex, 0.0, 1.0)


def _pink_texture(rng: np.random.Generator, size: int = 1024,
                  beta: float = 1.2) -> np.ndarray:
    """Natural-image texture: random phase with a 1/f^beta amplitude
    spectrum (the canonical natural-image statistic). Smooth gradients,
    few sharp corners — the opposite regime from _multiscale_texture and
    the statistics the reference's frontend starves on (TUM fr1,
    /root/reference/README.md:212). Returns [size,size] float in [0,1]."""
    f = np.fft.fftfreq(size)
    fx, fy = np.meshgrid(f, f)
    r = np.sqrt(fx * fx + fy * fy)
    r[0, 0] = 1.0 / size
    amp = r ** (-beta)
    phase = rng.uniform(0.0, 2.0 * np.pi, (size, size))
    img = np.real(np.fft.ifft2(amp * np.exp(1j * phase)))
    img = (img - img.min()) / (np.ptp(img) + 1e-12)
    return img


def _repeated_texture(rng: np.random.Generator, size: int = 1024,
                      period: int = 64) -> np.ndarray:
    """EXACT periodic tiling of one random high-contrast patch — every
    corner recurs at every ``period`` texels, so its BRIEF descriptor
    recurs too: an aliasing trap for any nearest-descriptor matcher
    (brick walls / tiled floors / curtain walls in real footage).
    Returns [size,size] float in [0,1]."""
    tile = np.zeros((period, period), dtype=np.float64)
    for cell in (4, 8, 16):
        n = max(period // cell, 1)
        tile += np.kron(rng.uniform(0, 1, (n, n)),
                        np.ones((cell, cell)))[:period, :period]
    tile /= 3.0
    tile = 0.15 + 0.7 * (tile > 0.5) + 0.15 * tile
    reps = size // period + 1
    return np.clip(np.tile(tile, (reps, reps))[:size, :size], 0.0, 1.0)


def _tex_lookup(tex: np.ndarray, tu: np.ndarray, tv: np.ndarray) -> np.ndarray:
    """Bilinear wrap-around texture fetch (tu/tv in texels)."""
    th, tw = tex.shape
    iu = np.mod(tu, tw - 1)
    iv = np.mod(tv, th - 1)
    # float mod can round up to exactly tw-1 for large/negative inputs;
    # clamp so i0+1 stays in bounds
    i0 = np.clip(np.floor(iv).astype(int), 0, th - 2)
    j0 = np.clip(np.floor(iu).astype(int), 0, tw - 2)
    fv, fu = iv - i0, iu - j0
    return (tex[i0, j0] * (1 - fu) * (1 - fv)
            + tex[i0, j0 + 1] * fu * (1 - fv)
            + tex[i0 + 1, j0] * (1 - fu) * fv
            + tex[i0 + 1, j0 + 1] * fu * fv)


@dataclass
class Plane:
    """Textured plane: point p0, unit normal n, in-plane axes (u, v), and a
    texture sampled at ``scale`` texels per world unit."""

    p0: np.ndarray
    n: np.ndarray
    u: np.ndarray
    v: np.ndarray
    tex: np.ndarray
    scale: float = 100.0

    def intersect(self, origin: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        """Ray-plane hit distances, [P] (inf where miss)."""
        denom = self.n @ dirs
        with np.errstate(divide="ignore", invalid="ignore"):
            t_hit = ((self.p0 - origin) @ self.n) / denom
        t_hit = np.where((np.abs(denom) > 1e-9) & (t_hit > 0.05), t_hit, np.inf)
        return t_hit

    def shade(self, X: np.ndarray) -> np.ndarray:
        """Texture color at world hit points X [3, Pv]."""
        rel = X - self.p0[:, None]
        return _tex_lookup(self.tex, (self.u @ rel) * self.scale,
                           (self.v @ rel) * self.scale)


@dataclass
class Sphere:
    """Textured sphere — a smooth OCCLUDING object: its silhouette sweeps
    across the background as the camera moves, creating the parallax
    discontinuities (appearing/disappearing landmarks, depth edges) that a
    plane-only scene never produces."""

    center: np.ndarray
    radius: float
    tex: np.ndarray
    scale: float = 200.0   # texels per radian

    def intersect(self, origin: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        oc = (origin - self.center)[:, None]                      # [3,1]
        a = np.sum(dirs * dirs, axis=0)
        b = 2.0 * np.sum(oc * dirs, axis=0)
        c = float(oc[:, 0] @ oc[:, 0]) - self.radius * self.radius
        disc = b * b - 4 * a * c
        with np.errstate(invalid="ignore"):
            sq = np.sqrt(np.maximum(disc, 0.0))
            t0 = (-b - sq) / (2 * a)
            t1 = (-b + sq) / (2 * a)
        t_hit = np.where(t0 > 0.05, t0, t1)
        return np.where((disc > 0) & (t_hit > 0.05), t_hit, np.inf)

    def shade(self, X: np.ndarray) -> np.ndarray:
        d = X - self.center[:, None]
        d = d / (np.linalg.norm(d, axis=0, keepdims=True) + 1e-12)
        theta = np.arctan2(d[1], d[0])
        phi = np.arccos(np.clip(d[2], -1, 1))
        return _tex_lookup(self.tex, theta * self.scale, phi * self.scale)


@dataclass
class Box:
    """Textured axis-aligned box — a hard OCCLUDING object with sharp
    silhouette edges (the worst-case parallax discontinuity: background
    landmarks vanish behind it abruptly)."""

    p_min: np.ndarray
    p_max: np.ndarray
    tex: np.ndarray
    scale: float = 150.0   # texels per world unit

    def intersect(self, origin: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / dirs                                      # [3,P]
            t_lo = (self.p_min[:, None] - origin[:, None]) * inv
            t_hi = (self.p_max[:, None] - origin[:, None]) * inv
        t_near = np.max(np.minimum(t_lo, t_hi), axis=0)
        t_far = np.min(np.maximum(t_lo, t_hi), axis=0)
        hit = (t_near <= t_far) & (t_far > 0.05)
        t_hit = np.where(t_near > 0.05, t_near, t_far)
        return np.where(hit, t_hit, np.inf)

    def shade(self, X: np.ndarray) -> np.ndarray:
        # face-dependent planar UV: drop the dominant-normal axis
        ctr = (self.p_min + self.p_max) / 2.0
        half = (self.p_max - self.p_min) / 2.0 + 1e-12
        rel = (X - ctr[:, None]) / half[:, None]
        axis = np.argmax(np.abs(rel), axis=0)                     # [Pv]
        u_axis = (axis + 1) % 3
        v_axis = (axis + 2) % 3
        cols = np.arange(X.shape[1])
        return _tex_lookup(self.tex, X[u_axis, cols] * self.scale,
                           X[v_axis, cols] * self.scale)


def default_scene(seed: int = 0) -> list[Plane]:
    """A room-like scene: far wall, floor, ceiling-ish slab, and a side wall.
    Depths range ~2-8 world units in front of the initial camera."""
    rng = np.random.default_rng(seed)
    mk = lambda: _multiscale_texture(rng)
    z = np.array([0.0, 0.0, 1.0])
    x = np.array([1.0, 0.0, 0.0])
    y = np.array([0.0, 1.0, 0.0])
    return [
        # far wall at z=8, facing camera
        Plane(p0=np.array([0.0, 0.0, 8.0]), n=-z, u=x, v=y, tex=mk(), scale=80.0),
        # floor at y=1.2 (camera looks +z, y down-ish)
        Plane(p0=np.array([0.0, 1.2, 0.0]), n=-y, u=x, v=z, tex=mk(), scale=100.0),
        # ceiling at y=-1.5
        Plane(p0=np.array([0.0, -1.5, 0.0]), n=y, u=x, v=z, tex=mk(), scale=100.0),
        # left wall at x=-2.5
        Plane(p0=np.array([-2.5, 0.0, 0.0]), n=x, u=z, v=y, tex=mk(), scale=90.0),
        # right wall at x=2.5
        Plane(p0=np.array([2.5, 0.0, 0.0]), n=-x, u=z, v=y, tex=mk(), scale=90.0),
    ]


def adversarial_scene(seed: int = 100) -> list:
    """Scene family B — built to be EVALUATED on, never tuned on
    (VERDICT r3 missing #1). Three failure axes the friendly benchmark
    scene lacks, matching where real footage breaks VO frontends:

    - **natural-image statistics**: walls/floor carry 1/f^beta spectra
      (_pink_texture) instead of binarized multiscale blobs — weak, sparse
      FAST responses;
    - **repeated texture**: the far wall is an EXACT periodic tiling
      (_repeated_texture) — descriptors recur every period, baiting the
      matcher into aliased correspondences;
    - **non-planar occluding geometry**: boxes and spheres at 1.5-5 units
      create parallax discontinuities — background landmarks appear and
      vanish abruptly at silhouette edges as the camera translates.

    Uses a DIFFERENT seed default than default_scene so even the texture
    draws are out-of-family.
    """
    rng = np.random.default_rng(seed)
    z = np.array([0.0, 0.0, 1.0])
    x = np.array([1.0, 0.0, 0.0])
    y = np.array([0.0, 1.0, 0.0])
    return [
        # far wall: exact-repetition tiling (matcher aliasing trap)
        Plane(p0=np.array([0.0, 0.0, 9.0]), n=-z, u=x, v=y,
              tex=_repeated_texture(rng, period=64), scale=80.0),
        # floor and ceiling: natural 1/f spectra (FAST-starving)
        Plane(p0=np.array([0.0, 1.3, 0.0]), n=-y, u=x, v=z,
              tex=_pink_texture(rng), scale=110.0),
        Plane(p0=np.array([0.0, -1.6, 0.0]), n=y, u=x, v=z,
              tex=_pink_texture(rng), scale=110.0),
        # side walls: natural spectra with different beta (softer still)
        Plane(p0=np.array([-2.8, 0.0, 0.0]), n=x, u=z, v=y,
              tex=_pink_texture(rng, beta=1.5), scale=95.0),
        Plane(p0=np.array([2.8, 0.0, 0.0]), n=-x, u=z, v=y,
              tex=_pink_texture(rng, beta=1.5), scale=95.0),
        # occluders: textured boxes + spheres across the depth range
        Box(p_min=np.array([-1.6, 0.1, 2.6]), p_max=np.array([-0.9, 1.3, 3.4]),
            tex=_multiscale_texture(rng), scale=220.0),
        Box(p_min=np.array([0.7, -0.4, 4.2]), p_max=np.array([1.5, 1.3, 5.1]),
            tex=_pink_texture(rng, beta=0.9), scale=260.0),
        Sphere(center=np.array([-0.2, -0.7, 3.6]), radius=0.45,
               tex=_multiscale_texture(rng), scale=260.0),
        Sphere(center=np.array([1.9, 0.4, 6.5]), radius=0.7,
               tex=_pink_texture(rng, beta=1.0), scale=300.0),
        Box(p_min=np.array([-0.5, 0.6, 5.8]), p_max=np.array([0.4, 1.3, 6.6]),
            tex=_repeated_texture(rng, period=48), scale=240.0),
    ]


def planar_scene(seed: int = 200) -> list:
    """Scene family C — a single dominant plane filling the view: the
    regime where two-view initialization MUST go through the homography
    path (the degenerate case for E; /root/reference/src/geometry/
    motion_estimation.cpp:90-156 exists exactly for this). A frontal
    textured wall at z=6; side surfaces are pushed outside the FOV of the
    benchmark trajectory so >95% of pixels see the one plane."""
    rng = np.random.default_rng(seed)
    z = np.array([0.0, 0.0, 1.0])
    x = np.array([1.0, 0.0, 0.0])
    y = np.array([0.0, 1.0, 0.0])
    return [
        Plane(p0=np.array([0.0, 0.0, 6.0]), n=-z, u=x, v=y,
              tex=_multiscale_texture(rng), scale=90.0),
        # distant floor strip, mostly out of frame (keeps rays bounded)
        Plane(p0=np.array([0.0, 6.0, 0.0]), n=-y, u=x, v=z,
              tex=_multiscale_texture(rng), scale=60.0),
    ]


# ---------------------------------------------------------------------------
# trajectory
# ---------------------------------------------------------------------------


def make_trajectory(n_frames: int, seed: int = 0, translation_step: float = 0.04,
                    lateral_amp: float = 0.6, yaw_amp: float = 0.08) -> np.ndarray:
    """Smooth forward+lateral trajectory with gentle yaw/pitch, [N,4,4]
    T_w_c poses. Motion magnitudes are sized so the reference's thresholds
    (keyframe dist 0.03, init pixel-dist 50) trigger naturally."""
    from scipy.spatial.transform import Rotation

    ts = np.arange(n_frames, dtype=np.float64)
    # position: forward z plus lateral sinusoid
    px = lateral_amp * np.sin(ts * 2 * np.pi / max(n_frames, 60))
    py = 0.08 * np.sin(ts * 2 * np.pi / 37.0)
    pz = ts * translation_step
    yaw = yaw_amp * np.sin(ts * 2 * np.pi / max(n_frames, 80))
    pitch = 0.03 * np.sin(ts * 2 * np.pi / 53.0)
    poses = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        R = Rotation.from_euler("yx", [yaw[i], pitch[i]]).as_matrix()
        poses[i, :3, :3] = R
        poses[i, :3, 3] = [px[i], py[i], pz[i]]
        poses[i, 3, 3] = 1.0
    return poses


def make_adversarial_trajectory(n_frames: int, seed: int = 0,
                                translation_step: float = 0.05) -> np.ndarray:
    """Trajectory with the motion regimes the benchmark trajectory avoids
    (VERDICT r3 missing #1): three smooth segments —

    1. frames [0, n/3):    translation-dominant (so monocular init can
                           succeed; same shape as the benchmark),
    2. frames [n/3, 2n/3): ROTATION-DOMINANT — yaw sweeps +/-14 deg on a
                           FIXED 20-frame period (peak rate ~4.5 deg/frame
                           ~ 48 px image motion at fx=615, independent of
                           n_frames) while forward translation drops to
                           step/3 (rotation gives zero parallax:
                           triangulation angles collapse and the angle
                           filter must carry it),
    3. frames [2n/3, n):   LOW-PARALLAX creep — translation step/8
                           (keyframe spacing starves, map growth stalls).

    Returns [N,4,4] T_w_c.
    """
    from scipy.spatial.transform import Rotation

    ts = np.arange(n_frames, dtype=np.float64)
    n1, n2 = n_frames // 3, 2 * n_frames // 3
    # per-frame forward speed by segment, smoothed to avoid jerk
    speed = np.full(n_frames, translation_step)
    speed[n1:n2] = translation_step / 3.0
    speed[n2:] = translation_step / 8.0
    speed = np.convolve(speed, np.ones(7) / 7.0, mode="same")
    pz = np.concatenate([[0.0], np.cumsum(speed)[:-1]])
    px = 0.35 * np.sin(ts * 2 * np.pi / max(n_frames, 60))
    py = 0.06 * np.sin(ts * 2 * np.pi / 41.0)
    # yaw: gentle in segment 1, sweeping in segment 2, settling in 3
    yaw = 0.05 * np.sin(ts * 2 * np.pi / 80.0)
    # fixed 20-frame sweep period: peak yaw rate 0.25*2pi/20 ~ 4.5 deg/
    # frame regardless of sequence length (a length-scaled period would
    # soften the stress as n grows)
    sweep = 0.25 * np.sin((ts - n1) * 2 * np.pi / 20.0)
    ramp = np.clip((ts - n1) / 6.0, 0, 1) * np.clip((n2 - ts) / 6.0, 0, 1)
    yaw = yaw + sweep * ramp
    pitch = 0.025 * np.sin(ts * 2 * np.pi / 57.0)
    poses = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        poses[i, :3, :3] = Rotation.from_euler(
            "yx", [yaw[i], pitch[i]]).as_matrix()
        poses[i, :3, 3] = [px[i], py[i], pz[i]]
        poses[i, 3, 3] = 1.0
    return poses


def make_planar_trajectory(n_frames: int, seed: int = 0,
                           lateral_step: float = 0.05) -> np.ndarray:
    """Wall-facing trajectory for the planar (homography-init) sequence:
    lateral translation with gentle approach and yaw, always facing the
    z=6 wall of :func:`planar_scene`. Parallax exists (translation), but
    every correspondence lies on ONE plane, so E is degenerate and the
    H score must win the model selection."""
    from scipy.spatial.transform import Rotation

    ts = np.arange(n_frames, dtype=np.float64)
    px = ts * lateral_step * 0.8
    py = 0.05 * np.sin(ts * 2 * np.pi / 43.0)
    pz = 0.4 * np.sin(ts * 2 * np.pi / max(n_frames * 2, 80))  # slow approach sway
    yaw = 0.06 * np.sin(ts * 2 * np.pi / max(n_frames, 70))
    poses = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        poses[i, :3, :3] = Rotation.from_euler("y", yaw[i]).as_matrix()
        poses[i, :3, 3] = [px[i], py[i], pz[i]]
        poses[i, 3, 3] = 1.0
    return poses


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------


def render_frame(T_w_c: np.ndarray, objects: list, K: np.ndarray,
                 height: int = 480, width: int = 640) -> np.ndarray:
    """Render one grayscale frame by exact ray tracing (planes / spheres /
    boxes) with a z-buffer and bilinear texture lookup. Returns uint8
    [H, W]."""
    Kinv = np.linalg.inv(K)
    us, vs = np.meshgrid(np.arange(width), np.arange(height))
    pix = np.stack([us.ravel(), vs.ravel(), np.ones(us.size)], axis=0)  # [3, P]
    dirs_cam = (Kinv @ pix)  # [3, P]
    R, t = T_w_c[:3, :3], T_w_c[:3, 3]
    dirs = R @ dirs_cam  # world-frame ray directions
    origin = t

    best_t = np.full(us.size, np.inf)
    img = np.zeros(us.size, dtype=np.float64)
    for obj in objects:
        t_hit = obj.intersect(origin, dirs)
        valid = t_hit < best_t
        if not valid.any():
            continue
        X = origin[:, None] + dirs[:, valid] * t_hit[valid]  # [3, Pv]
        img[valid] = obj.shade(X)
        best_t[valid] = t_hit[valid]
    return (np.clip(img, 0, 1) * 255).astype(np.uint8).reshape(height, width)


def render_sequence(out_dir: str, n_frames: int = 60, seed: int = 0,
                    height: int = 480, width: int = 640,
                    fx: float = 615.0, fy: float = 615.0,
                    cx: float = 320.0, cy: float = 240.0,
                    translation_step: float = 0.04) -> np.ndarray:
    """Render a full benchmark sequence into ``out_dir`` in the reference's
    dataset layout: ``rgb_%05d.png`` frames + ``cam_traj_truth.txt`` ground
    truth. Returns the [N,4,4] GT poses."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    planes = default_scene(seed)
    poses = make_trajectory(n_frames, seed, translation_step=translation_step)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    for i in range(n_frames):
        img = render_frame(poses[i], planes, K, height, width)
        Image.fromarray(img).save(os.path.join(out_dir, f"rgb_{i:05d}.png"))
    vio.write_trajectory(os.path.join(out_dir, "cam_traj_truth.txt"), poses)
    return poses


# ---------------------------------------------------------------------------
# adversarial photometric perturbations (robustness evaluation)
# ---------------------------------------------------------------------------


def perturb_frames(frames: np.ndarray, kind: str, severity: float,
                   seed: int = 0) -> np.ndarray:
    """Apply an adversarial photometric perturbation to a rendered [N,H,W]
    sequence (float or uint8; returns float32 in [0,255]).

    The clean renderer's statistics are friendly to FAST (sharp binarized
    edges, _multiscale_texture); real imagery is not — the reference itself
    documents failing on TUM fr1 for feature-statistics reasons
    (/root/reference/README.md:212). These perturbations push the rendered
    frames toward the failure axes of real sensors:

    - ``noise``       — additive Gaussian sensor noise, sigma = ``severity``
                        gray levels (real CMOS at high gain: 3-10)
    - ``blur``        — horizontal motion blur (box kernel of width
                        ``severity`` px; lateral motion is this benchmark's
                        dominant image velocity)
    - ``exposure``    — slow exposure drift: per-frame gain
                        1 ± 0.5*severity and bias ±20*severity gray levels,
                        out of phase (auto-exposure hunting)
    - ``low_contrast``— contrast squeeze toward the frame mean by factor
                        ``severity`` (0..1; low-texture surfaces / flat
                        lighting — the axis that kills FAST threshold 20)
    - ``jpeg``        — compression artifacts: blockwise 8x8 DCT
                        quantization with a luminance table scaled by
                        ``severity`` (1 ≈ JPEG quality ~50, 2 ≈ ~25) —
                        blocking + ringing around edges, the dominant
                        artifact of compressed camera streams that BRIEF
                        comparisons see as structured descriptor noise
    - ``vignette``    — radial illumination falloff (cos^4 law raised to
                        ``severity``): corner gain drops to
                        (cos^4 θ_corner)^severity ≈ 0.64^severity, the
                        lens artifact that darkens exactly the image
                        regions where the matching radius gate needs
                        corners during rotation
    """
    rng = np.random.default_rng(seed)
    out = frames.astype(np.float32).copy()
    n = out.shape[0]
    if kind == "noise":
        out = out + rng.normal(0.0, severity, out.shape).astype(np.float32)
    elif kind == "blur":
        k = max(int(round(severity)), 1)
        if k > 1:
            kernel = np.ones(k, dtype=np.float32) / k
            from scipy.ndimage import convolve1d

            out = convolve1d(out, kernel, axis=2, mode="nearest")
    elif kind == "exposure":
        gain = 1.0 + 0.5 * severity * np.sin(np.arange(n) * 0.41)
        bias = 20.0 * severity * np.cos(np.arange(n) * 0.23)
        out = out * gain[:, None, None] + bias[:, None, None]
    elif kind == "low_contrast":
        mean = out.mean(axis=(1, 2), keepdims=True)
        out = mean + float(severity) * (out - mean)
    elif kind == "jpeg":
        out = np.stack([_jpeg_artifacts(f, severity) for f in out])
    elif kind == "vignette":
        H, W = out.shape[1:]
        us, vs = np.meshgrid(np.arange(W) - W / 2, np.arange(H) - H / 2)
        # cos^4 natural-vignetting law for a ~53 deg half-diagonal FOV
        # camera (fx ~= width): cos(theta) with r normalized so the image
        # corner sits at tan(theta_corner) = r_corner / fx
        fx = float(W)  # ~615 at 640 wide: close enough for the gain law
        cos_t = fx / np.sqrt(us * us + vs * vs + fx * fx)
        gain = (cos_t ** 4) ** float(severity)
        out = out * gain[None, :, :].astype(np.float32)
    else:
        raise ValueError(f"unknown perturbation kind: {kind}")
    return np.clip(out, 0.0, 255.0).astype(np.float32)


# the JPEG luminance quantization table (Annex K of the JPEG standard),
# the quality-50 baseline; severity scales it
_JPEG_Q50 = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)


def _jpeg_artifacts(img: np.ndarray, severity: float) -> np.ndarray:
    """Blockwise 8x8 DCT quantization (the lossy core of JPEG, without the
    entropy coding): introduces the blocking/ringing artifacts of a
    compressed camera stream. severity scales the Q50 table."""
    H, W = img.shape
    Hp, Wp = (H + 7) // 8 * 8, (W + 7) // 8 * 8
    padded = np.zeros((Hp, Wp), np.float64)
    padded[:H, :W] = img
    padded[H:, :W] = img[-1:, :]
    padded[:, W:] = padded[:, W - 1:W]
    # 8x8 DCT-II basis
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    C[0] /= np.sqrt(2)
    blocks = padded.reshape(Hp // 8, 8, Wp // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ab,ijbc,dc->ijad", C, blocks - 128.0, C)
    q = np.maximum(_JPEG_Q50 * severity, 1.0)
    coef = np.round(coef / q) * q
    rec = np.einsum("ba,ijbc,cd->ijad", C, coef, C) + 128.0
    out = rec.transpose(0, 2, 1, 3).reshape(Hp, Wp)
    return out[:H, :W]


# ---------------------------------------------------------------------------
# exact correspondence generators (for unit tests; no rendering)
# ---------------------------------------------------------------------------


@dataclass
class TwoViewScene:
    """Exact two-view correspondence set with known relative pose."""

    pts_w: np.ndarray      # [N,3] world points
    uv1: np.ndarray        # [N,2] pixels in view 1
    uv2: np.ndarray        # [N,2] pixels in view 2
    T_w_c1: np.ndarray     # [4,4]
    T_w_c2: np.ndarray
    K: np.ndarray          # [3,3]

    @property
    def T_c1_c2(self) -> np.ndarray:
        return np.linalg.inv(self.T_w_c1) @ self.T_w_c2


def _project(pts_w, T_w_c, K):
    Tcw = np.linalg.inv(T_w_c)
    pc = pts_w @ Tcw[:3, :3].T + Tcw[:3, 3]
    uv = pc[:, :2] / pc[:, 2:3] * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])
    return uv, pc[:, 2]


def synthesize_two_view(n: int = 200, seed: int = 0, planar: bool = False,
                        noise_px: float = 0.0, outlier_frac: float = 0.0,
                        baseline: float = 0.3) -> TwoViewScene:
    """Random 3-D points (or a plane if ``planar``) seen from two poses.
    Points are guaranteed in front of both cameras and inside a 640x480
    image. Optionally adds pixel noise and gross outliers."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    K = np.array([[615.0, 0, 320], [0, 615.0, 240], [0, 0, 1]])
    T1 = np.eye(4)
    T2 = np.eye(4)
    T2[:3, :3] = Rotation.from_euler("yxz", rng.uniform(-0.08, 0.08, 3)).as_matrix()
    T2[:3, 3] = np.array([baseline, 0.05, 0.1]) * (1 + 0.2 * rng.standard_normal(3))

    pts = np.zeros((0, 3))
    while len(pts) < n:
        m = 4 * n
        if planar:
            xy = rng.uniform(-3, 3, size=(m, 2))
            cand = np.stack([xy[:, 0], xy[:, 1], np.full(m, 5.0)], axis=1)
            # tilt the plane a bit
            Rp = Rotation.from_euler("xy", [0.3, 0.2]).as_matrix()
            cand = (cand - [0, 0, 5.0]) @ Rp.T + [0, 0, 5.0]
        else:
            cand = np.stack(
                [rng.uniform(-3, 3, m), rng.uniform(-2, 2, m), rng.uniform(2.5, 9.0, m)],
                axis=1,
            )
        uv1, z1 = _project(cand, T1, K)
        uv2, z2 = _project(cand, T2, K)
        ok = (z1 > 0.2) & (z2 > 0.2)
        for uv in (uv1, uv2):
            ok &= (uv[:, 0] > 5) & (uv[:, 0] < 635) & (uv[:, 1] > 5) & (uv[:, 1] < 475)
        pts = np.concatenate([pts, cand[ok]])[:n]
    uv1, _ = _project(pts, T1, K)
    uv2, _ = _project(pts, T2, K)
    if noise_px > 0:
        uv1 = uv1 + rng.normal(0, noise_px, uv1.shape)
        uv2 = uv2 + rng.normal(0, noise_px, uv2.shape)
    if outlier_frac > 0:
        n_out = int(n * outlier_frac)
        idx = rng.choice(n, n_out, replace=False)
        uv2[idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    return TwoViewScene(pts, uv1.astype(np.float64), uv2.astype(np.float64), T1, T2, K)


@dataclass
class PnPScene:
    """3-D world points + their pixels in a camera with known pose."""

    pts_w: np.ndarray     # [N,3]
    uv: np.ndarray        # [N,2]
    T_w_c: np.ndarray     # [4,4]
    K: np.ndarray


def synthesize_pnp_scene(n: int = 100, seed: int = 0, noise_px: float = 0.0,
                         outlier_frac: float = 0.0) -> PnPScene:
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    K = np.array([[615.0, 0, 320], [0, 615.0, 240], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("yxz", rng.uniform(-0.3, 0.3, 3)).as_matrix()
    T[:3, 3] = rng.uniform(-0.5, 0.5, 3)
    pts = np.zeros((0, 3))
    while len(pts) < n:
        m = 4 * n
        cand = np.stack(
            [rng.uniform(-3, 3, m), rng.uniform(-2, 2, m), rng.uniform(2.0, 9.0, m)], axis=1
        )
        uv, z = _project(cand, T, K)
        ok = (z > 0.2) & (uv[:, 0] > 5) & (uv[:, 0] < 635) & (uv[:, 1] > 5) & (uv[:, 1] < 475)
        pts = np.concatenate([pts, cand[ok]])[:n]
    uv, _ = _project(pts, T, K)
    if noise_px > 0:
        uv = uv + rng.normal(0, noise_px, uv.shape)
    if outlier_frac > 0:
        n_out = int(n * outlier_frac)
        idx = rng.choice(n, n_out, replace=False)
        uv[idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    return PnPScene(pts, uv, T, K)
