"""KITTI proxy sequences: full-resolution photoreal-textured renders along the
REAL KITTI ground-truth trajectories.

The build environment has no KITTI images (zero egress), but the reference
repo stores full frame-rate ground-truth trajectories for every sequence
(/root/reference/experiment_result/asnd/nvidia_asnd_KITTI*/stamped_groundtruth.txt,
TUM format, e.g. 4,541 poses for KITTI 00 / 800 for KITTI 03).  This module
drives a synthetic urban world along those real paths with the real camera
intrinsics (cameraconfig/KITTI/kitti*.txt) at the real 1241x376 resolution —
real vehicle dynamics (speeds, turns, elevation profile, loop geometry at
metric scale), synthetic appearance.  It is the closest executable stand-in
for the reference's KITTI ATE protocol (SURVEY.md §4, BASELINE.md).

World model: axis-aligned textured boxes (road slabs following the path's
elevation + "building" blocks flanking the street) rendered by per-pixel ray
casting, `lax.scan` over a fixed-size block of the nearest boxes (static
shapes; the host reselects the block per frame).  Frames are rendered on
device and fed straight to the tracker — no host round-trip.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from asdslam_tpu.io.synthetic import _hash01

GT_DIR = "/root/reference/experiment_result/asnd"
CAM_DIR = "/root/reference/cameraconfig/KITTI"

CAMERA_HEIGHT = 1.65          # KITTI left-gray camera above road (metres)

SEQ_CAMCFG = {
    "00": "kitti00-02.txt", "01": "kitti00-02.txt", "02": "kitti00-02.txt",
    "03": "kitti03.txt",
    **{f"{i:02d}": "kitti04-12.txt" for i in range(4, 13)},
}


# --------------------------------------------------------------------------- #
# Ground truth
# --------------------------------------------------------------------------- #
def load_tum_trajectory(path: str):
    """TUM `ts tx ty tz qx qy qz qw` -> (ts [N], pose7_cw [N, 7], centers [N, 3]).

    The stored pose is T_wc (camera position/orientation in the world = the
    t=0 camera frame: x right, y down, z forward).  pose7 is our packed T_cw
    (w, x, y, z, tx, ty, tz)."""
    d = np.loadtxt(path, dtype=np.float64)
    ts = d[:, 0]
    t_wc = d[:, 1:4]
    q = d[:, 4:8]  # x, y, z, w
    w, x, y, z = q[:, 3], q[:, 0], q[:, 1], q[:, 2]
    # R_wc from quaternion (batched)
    R_wc = np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=1)
    R_cw = np.transpose(R_wc, (0, 2, 1))
    t_cw = -np.einsum("nij,nj->ni", R_cw, t_wc)
    # quat of R_cw = conjugate of (w, x, y, z)
    q_cw = np.stack([w, -x, -y, -z], axis=1)
    q_cw /= np.linalg.norm(q_cw, axis=1, keepdims=True)
    pose7 = np.concatenate([q_cw, t_cw], axis=1).astype(np.float32)
    return ts, pose7, t_wc.astype(np.float32)


def gt_path(seq: str) -> str:
    return os.path.join(GT_DIR, f"nvidia_asnd_KITTI{seq}",
                        "stamped_groundtruth.txt")


def camera_config_path(seq: str) -> str:
    return os.path.join(CAM_DIR, SEQ_CAMCFG[seq])


# --------------------------------------------------------------------------- #
# World construction
# --------------------------------------------------------------------------- #
class World(NamedTuple):
    bmin: np.ndarray   # [B, 3]
    bmax: np.ndarray   # [B, 3]
    salt: np.ndarray   # [B] int32 texture seed per box


def build_world(centers: np.ndarray, seed: int = 3,
                road_spacing: float = 4.0, building_spacing: float = 6.0,
                lateral_min: float = 7.0, lateral_max: float = 15.0) -> World:
    """Procedural street world along the camera path.

    centers: [N, 3] camera positions in world (y DOWN).  Road slabs follow
    the elevation profile (ground = camera y + CAMERA_HEIGHT); building
    boxes flank the street at lateral offsets, culled if they'd intersect
    the path corridor."""
    rng = np.random.default_rng(seed)
    # resample path by arc length
    seg = np.linalg.norm(np.diff(centers, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = float(s[-1])

    def sample(spacing):
        si = np.arange(0.0, total, spacing)
        p = np.stack([np.interp(si, s, centers[:, k]) for k in range(3)], 1)
        # horizontal tangent for lateral placement
        tang = np.gradient(p, axis=0)
        tang[:, 1] = 0.0
        n = np.linalg.norm(tang, axis=1, keepdims=True)
        tang = tang / np.maximum(n, 1e-6)
        lat = np.stack([-tang[:, 2], np.zeros(len(p)), tang[:, 0]], 1)
        return p, lat

    bmins, bmaxs, salts = [], [], []

    # road slabs: thin boxes under the path (footprint covers the street)
    road_p, _ = sample(road_spacing)
    ground_y = road_p[:, 1] + CAMERA_HEIGHT
    half = road_spacing * 1.6
    for i, p in enumerate(road_p):
        bmins.append([p[0] - half, ground_y[i], p[2] - half])
        bmaxs.append([p[0] + half, ground_y[i] + 0.3, p[2] + half])
        salts.append(1000 + i)

    # buildings, both sides of the street
    b_p, b_lat = sample(building_spacing)
    path2d = centers[:, [0, 2]]
    for i, p in enumerate(b_p):
        gy = p[1] + CAMERA_HEIGHT
        for side in (-1.0, 1.0):
            off = rng.uniform(lateral_min, lateral_max)
            c = p + side * off * b_lat[i]
            hw = rng.uniform(2.0, 5.0)     # half footprint
            h = rng.uniform(4.0, 13.0)     # height
            # cull if the footprint encroaches on the path corridor
            d2 = np.min(np.linalg.norm(path2d - c[[0, 2]], axis=1))
            if d2 < hw + 4.5:
                continue
            bmins.append([c[0] - hw, gy - h, c[2] - hw])
            bmaxs.append([c[0] + hw, gy + 1.0, c[2] + hw])
            salts.append(i * 2 + (side > 0))

    return World(np.asarray(bmins, np.float32), np.asarray(bmaxs, np.float32),
                 np.asarray(salts, np.int32))


def select_boxes(world: World, cam_center: np.ndarray, k: int) -> World:
    """Nearest-k boxes to the camera — fixed-size render block."""
    c = np.asarray(cam_center, np.float32)
    mid = 0.5 * (world.bmin + world.bmax)
    d = np.linalg.norm(mid - c[None, :], axis=1)
    if len(d) <= k:
        pad = k - len(d)
        # pad with degenerate far-away boxes
        far = np.full((pad, 3), 1e7, np.float32)
        return World(np.concatenate([world.bmin, far]),
                     np.concatenate([world.bmax, far]),
                     np.concatenate([world.salt, np.zeros(pad, np.int32)]))
    idx = np.argpartition(d, k)[:k]
    return World(world.bmin[idx], world.bmax[idx], world.salt[idx])


# --------------------------------------------------------------------------- #
# Renderer
# --------------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=("height", "width", "return_depth"))
def render_boxes(pose7, K, bmin, bmax, salt, height: int, width: int,
                 tex_scale: float = 0.35, return_depth: bool = False):
    """Ray-cast the box world from camera pose T_cw -> [H, W] grayscale.

    return_depth: also return the per-pixel ray-hit parameter t (distance
    along the unit-z-normalized camera ray; BIG where the sky is hit) —
    ground-truth correspondence supervision for descriptor training."""
    v, u = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                        jnp.arange(width, dtype=jnp.float32), indexing="ij")
    xn = (u - K[0, 2]) / K[0, 0]
    yn = (v - K[1, 2]) / K[1, 1]
    return raycast_grid(pose7, xn, yn, bmin, bmax, salt,
                        tex_scale=tex_scale, return_depth=return_depth)


@functools.partial(jax.jit, static_argnames=("return_depth",))
def raycast_grid(pose7, xn, yn, bmin, bmax, salt,
                 tex_scale: float = 0.35, return_depth: bool = False):
    """Core ray-caster over an arbitrary normalized-coordinate grid
    (xn, yn [H, W]): pinhole rendering passes the ideal grid; a DISTORTED
    camera (EuRoC radtan, euroc_proxy.py) passes the undistorted-pixel grid
    so the rendered image exhibits the real lens distortion."""
    from asdslam_tpu.geometry import se3
    R, t = se3.pose_unpack(pose7)
    c = -R.T @ t
    d = jnp.einsum("ji,hwj->hwi", R, jnp.stack([xn, yn, jnp.ones_like(xn)], -1))
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)

    BIG = 1e8

    def body(carry, box):
        t_best, salt_best, axis_best = carry
        lo, hi, sl = box
        t1 = (lo - c) * inv_d          # [H, W, 3]
        t2 = (hi - c) * inv_d
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        tn = jnp.max(tmin, axis=-1)
        tf = jnp.min(tmax, axis=-1)
        hit = (tf > jnp.maximum(tn, 1e-3)) & (tn < t_best)
        ax = jnp.argmax(tmin, axis=-1).astype(jnp.int32)
        t_best = jnp.where(hit, tn, t_best)
        salt_best = jnp.where(hit, sl, salt_best)
        axis_best = jnp.where(hit, ax, axis_best)
        return (t_best, salt_best, axis_best), None

    init = (jnp.full(xn.shape, BIG),
            jnp.zeros(xn.shape, jnp.int32),
            jnp.zeros(xn.shape, jnp.int32))
    (t_hit, salt_hit, axis_hit), _ = jax.lax.scan(
        body, init, (bmin, bmax, salt.astype(jnp.int32)))

    p = c + t_hit[..., None] * d
    # texture coords: the two axes orthogonal to the entry face
    ab = jnp.stack([
        jnp.stack([p[..., 1], p[..., 2]], -1),   # hit x-face -> (y, z)
        jnp.stack([p[..., 0], p[..., 2]], -1),   # hit y-face -> (x, z)
        jnp.stack([p[..., 0], p[..., 1]], -1),   # hit z-face -> (x, y)
    ], axis=0)
    sel = jnp.take_along_axis(ab, axis_hit[None, ..., None], axis=0)[0]

    # Three value-noise octaves, every one keyed on the BOX id (salt_hit is a
    # per-pixel array; _hash01 broadcasts): without the per-box key, two
    # walls at different positions along the dropped texture axis alias
    # exactly, which is precisely the self-similarity that made descriptor
    # matching noisy on earlier proxy runs.  The fine octave carries most of
    # the per-patch entropy; it is faded with distance (its ~0.1 m blocks
    # drop under ~4 px beyond ~20 m — un-mipmapped it would alias into
    # temporally unstable texture, hurting frame-to-frame matching).
    def octave(mul, ds):
        ia = jnp.floor(sel[..., 0] / (tex_scale * mul)).astype(jnp.int32)
        ib = jnp.floor(sel[..., 1] / (tex_scale * mul)).astype(jnp.int32)
        return _hash01(ia, ib, salt_hit + ds)
    v_base = octave(1.0, 1)
    v_coarse = octave(3.7, 17)
    v_fine = octave(0.3, 29)
    w_fine = jax.nn.sigmoid((18.0 - t_hit) * 0.25)
    tex = 0.40 * v_base + 0.30 * v_coarse \
        + 0.30 * (w_fine * v_fine + (1.0 - w_fine) * 0.5)
    # per-box albedo for inter-box brightness contrast
    salt_f = (salt_hit.astype(jnp.float32) * 0.618) % 1.0
    img = 0.18 + 0.62 * tex + 0.08 * salt_f
    img = img * (1.0 / (1.0 + 0.006 * t_hit))   # distance shading
    sky = 0.72 + 0.06 * yn                       # featureless gradient
    img = jnp.where(t_hit >= BIG, sky, img)
    img = jnp.clip(img, 0.0, 1.0)
    if return_depth:
        return img, t_hit
    return img


# --------------------------------------------------------------------------- #
# Sequence facade
# --------------------------------------------------------------------------- #
class KittiProxySequence:
    """Lazily rendered proxy sequence: seq[i] -> (timestamp, device image).

    scale: render at reduced resolution with proportionally scaled
    intrinsics (tests); 1.0 = the real 1241x376."""

    def __init__(self, seq: str = "03", scale: float = 1.0, n_boxes: int = 256,
                 max_frames: int = None, seed: int = 3):
        from asdslam_tpu.io import datasets
        self.seq = seq
        info = datasets.read_cam_info(camera_config_path(seq))
        self.width = int(round(1241 * scale))
        self.height = int(round(376 * scale))
        self.fx = info["fx"] * scale
        self.fy = info["fy"] * scale
        self.cx = info["cx"] * scale
        self.cy = info["cy"] * scale
        self.K = jnp.array([[self.fx, 0, self.cx], [0, self.fy, self.cy],
                            [0, 0, 1.0]], jnp.float32)
        ts, pose7, centers = load_tum_trajectory(gt_path(seq))
        # the WORLD is always built from the full path (a short tracked
        # prefix must still see the street continuing ahead)
        self.world = build_world(centers, seed=seed)
        if max_frames:
            ts, pose7, centers = ts[:max_frames], pose7[:max_frames], centers[:max_frames]
        self.timestamps = ts
        self.gt_pose7 = pose7
        self.centers = centers
        self.n_boxes = min(n_boxes, len(self.world.salt))

    def __len__(self):
        return len(self.timestamps)

    def __getitem__(self, i: int):
        w = select_boxes(self.world, self.centers[i], self.n_boxes)
        img = render_boxes(jnp.asarray(self.gt_pose7[i]), self.K,
                           jnp.asarray(w.bmin), jnp.asarray(w.bmax),
                           jnp.asarray(w.salt), self.height, self.width)
        return float(self.timestamps[i]), img

    def config(self, base=None, **kw):
        from asdslam_tpu.config import SlamConfig
        base = base or SlamConfig()
        return base.replace(image_width=self.width, image_height=self.height,
                            fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy,
                            **kw)
