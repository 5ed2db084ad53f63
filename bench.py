"""Benchmark: SLAM per-frame hot path throughput on one TPU chip.

Primary metric — the FUSED TRACKING STEP at the reference workload shape
(1241x376 KITTI image, 2000 features, 8 pyramid levels, ASDNet descriptors —
run_vslam_kitti.sh defaults): extract + motion-model projection search +
pose-only BA (4x10 LM iters) + local-map projection search against an 8192-
point candidate block + second pose-only BA, i.e. the full per-frame path of
the reference's Tracking::Track (src/vslam/src/Tracking.cc:213-383), as ONE
jitted program (asdslam_tpu/frontend/track_step.py).

Methodology: frames are CHAINED exactly like the real tracker's dataflow —
frame i+1 consumes frame i's output features, pose, velocity and device-
resident geometry block, so no frame can start before its predecessor
finished.  The host streams dispatches and synchronizes once at the end (the
TPU execution model; per-frame host syncs would only measure the network
tunnel's RTT, which co-located deployments don't pay).  Timing windows use
median-of-3 to reject tunnel latency spikes without optimistic bias.

Extra fields: `frontend_fps` (extract + frame-to-frame window match — round-2
continuity metric) and `local_ba_ms` (one local-BA program at the reference
window shape: 16 cameras / 4096 points / 16384 observations — the KF-rate
mapping cost, LocalMapping.cc:86-92).

Baseline: 30 fps = 3x a NOMINAL 10 fps CPU reference (BASELINE.md publishes
no fps; this anchor is a declared fiction for trend tracking, not a measured
reference number).

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def median_window_fps(fn, n_timed=60, reps=3):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync = fn(n_timed)
        np.asarray(sync)  # one sync: the chain serializes all steps
        dt = time.perf_counter() - t0
        samples.append(n_timed / dt)
    return float(np.median(samples))


def main():
    from asdslam_tpu.config import SlamConfig
    from asdslam_tpu.frontend import extractor as extractor_mod
    from asdslam_tpu.frontend import track_step as track_step_mod
    from asdslam_tpu.models import asdnet
    from asdslam_tpu.ops import match
    from asdslam_tpu.io import synthetic
    from asdslam_tpu.backend import ba

    cfg = SlamConfig(use_pallas_match='--no_pallas' not in sys.argv)  # KITTI defaults: 2000 features, 8 levels, 1241x376
    K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]], jnp.float32)
    weights_path = os.path.join(os.path.dirname(__file__), "asdnet_weights.pkl")
    if os.path.exists(weights_path):
        import pickle
        with open(weights_path, "rb") as f:
            params = pickle.load(f)
    else:
        params = asdnet.init_params(jax.random.PRNGKey(0))
    desc_fn = lambda patches: asdnet.apply(params, patches)
    extract = extractor_mod.make_extractor(cfg, desc_fn)

    # pre-render frames on host as uint8 (rendering excluded from timing; the
    # timed loop includes the u8 host->device upload like a real data loader)
    frames, poses = synthetic.render_sequence(
        K, n_frames=8, height=cfg.image_height, width=cfg.image_width, step=0.3)
    frames_u8 = [np.asarray(np.clip(np.asarray(frames[i]) * 255.0, 0, 255),
                            np.uint8) for i in range(8)]

    # ---------------------------------------------------------------- #
    # 1. fused tracking step (primary)
    # ---------------------------------------------------------------- #
    fused = track_step_mod.make_track_step(cfg, K, extract)
    N, P = cfg.n_features, cfg.local_ba_max_points
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 4)
    # representative state blocks: geometry in front of the camera; runtime
    # is shape-determined (masked matmuls + fixed LM iterations), so the
    # exact match rate does not change the measured cost
    pos_n = jax.random.uniform(ks[0], (N, 3), minval=-10.0, maxval=10.0) + jnp.array([0., 0., 15.])
    pos_p = jax.random.uniform(ks[1], (P, 3), minval=-10.0, maxval=10.0) + jnp.array([0., 0., 15.])
    prev_feat = extract(jnp.asarray(frames_u8[0], jnp.uint8).astype(jnp.float32) / 255.0)
    prev_geom = track_step_mod.GeomBlock(
        pos=pos_n, normal=jnp.tile(jnp.array([0., 0., -1.]), (N, 1)),
        min_dist=jnp.full((N,), 2.0), max_dist=jnp.full((N,), 80.0),
        valid=jnp.ones((N,), bool))
    cand = track_step_mod.PointBlock(
        pos=pos_p, normal=jnp.tile(jnp.array([0., 0., -1.]), (P, 1)),
        min_dist=jnp.full((P,), 2.0), max_dist=jnp.full((P,), 80.0),
        desc=jax.random.normal(ks[2], (P, cfg.descriptor_dim)) * 0.1,
        valid=jnp.ones((P,), bool))
    crow0 = jnp.full((N,), -1, jnp.int32)
    pose0 = jnp.array([1., 0., 0., 0., 0., 0., 0.], jnp.float32)
    vel0 = jnp.array([1., 0., 0., 0., 0., 0., 0.3], jnp.float32)

    state = {"feat": prev_feat, "geom": prev_geom, "pose": pose0, "vel": vel0,
             "crow": crow0}

    def run_fused(n):
        feat, geom, pose, vel, crow = (state["feat"], state["geom"],
                                       state["pose"], state["vel"],
                                       state["crow"])
        res = None
        for i in range(n):
            feat, res = fused(jnp.asarray(frames_u8[i % 8]), pose, vel,
                              feat, geom, cand, crow)
            geom, pose, vel, crow = (res.next_geom, res.pose, res.velocity,
                                     res.crow)
        state.update(feat=feat, geom=geom, pose=pose, vel=vel, crow=crow)
        return res.n_inliers

    np.asarray(run_fused(2))  # warmup / compile
    fused_fps = median_window_fps(run_fused)

    # ---------------------------------------------------------------- #
    # 2. extract + window match (round-2 continuity metric)
    # ---------------------------------------------------------------- #
    @jax.jit
    def frame_step(img_u8, prev):
        img = img_u8.astype(jnp.float32) * (1.0 / 255.0)
        f = extract(img)
        idx, d, ok = match.search_window(
            prev.desc, f.desc, prev.uv_und, f.uv_und, prev.valid, f.valid,
            radius=100.0, max_dist=1.0, ratio=0.9,
            angles_a=prev.angle, angles_b=f.angle, check_rotation=True)
        return f, jnp.sum(ok)

    fs = {"prev": prev_feat}

    def run_frontend(n):
        prev, cnt = fs["prev"], None
        for i in range(n):
            prev, cnt = frame_step(jnp.asarray(frames_u8[i % 8]), prev)
        fs["prev"] = prev
        return cnt

    np.asarray(run_frontend(2))
    frontend_fps = median_window_fps(run_frontend)

    # ---------------------------------------------------------------- #
    # 3. local BA at the reference window shape (KF-rate mapping cost)
    # ---------------------------------------------------------------- #
    C, Pt, O = cfg.local_ba_max_kfs + cfg.local_ba_max_fixed, 4096, 16384
    kb = jax.random.split(jax.random.PRNGKey(9), 3)
    pts = jax.random.uniform(kb[0], (Pt, 3), minval=-5.0, maxval=5.0) + jnp.array([0., 0., 10.])
    poses7 = jnp.tile(pose0, (C, 1)).at[:, 6].set(jnp.arange(C) * 0.1)
    cam_idx = jax.random.randint(kb[1], (O,), 0, C)
    pt_idx = jax.random.randint(kb[2], (O,), 0, Pt)
    uv = jnp.stack([K[0, 0] * pts[pt_idx, 0] / pts[pt_idx, 2] + K[0, 2],
                    K[1, 1] * pts[pt_idx, 1] / pts[pt_idx, 2] + K[1, 2]], 1)
    obs = ba.Obs(cam_idx=cam_idx.astype(jnp.int32), pt_idx=pt_idx.astype(jnp.int32),
                 uv=uv, inv_sigma2=jnp.ones(O), valid=jnp.ones(O, bool))
    pt_obs = ba.build_pt_obs(np.asarray(pt_idx), np.ones(O, bool), Pt, 16)
    prob = ba.BAProblem(poses7=poses7, points=pts, pt_valid=jnp.ones(Pt, bool),
                        obs=obs, pt_obs=jnp.asarray(pt_obs))
    out = ba.bundle_adjust(prob, K, n_opt=cfg.local_ba_max_kfs, iters=15)
    jax.block_until_ready(out)
    tb = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(ba.bundle_adjust(prob, K, n_opt=cfg.local_ba_max_kfs, iters=15))
        tb.append((time.perf_counter() - t0) * 1000.0)
    local_ba_ms = float(np.median(tb))

    baseline_fps = 30.0  # declared anchor: 3x NOMINAL 10 fps CPU (see docstring)
    out = {
        "metric": "fused_track_fps_kitti_shape",
        "value": round(fused_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fused_fps / baseline_fps, 3),
        "frontend_fps": round(frontend_fps, 2),
        "local_ba_ms": round(local_ba_ms, 1),
        "use_pallas_match": cfg.use_pallas_match,
        "baseline_note": "30fps = 3x nominal 10fps CPU; reference publishes no fps",
    }
    # e2e system fps from the most recent full-sequence eval artifact (the
    # microbench measures the fused step; the artifact carries the honest
    # whole-system number including mapping/loop closure at KF rate).
    # The artifact's mtime is reported so a stale number — committed under
    # an older tree than the one being benchmarked — is detectable.
    for art in ("ATE_r05_seq00_asd.json", "ATE_r04_seq00_asd.json",
                "ATE_r04_seq00.json", "ATE_r04_seq03.json"):
        p = os.path.join(os.path.dirname(__file__), art)
        if os.path.exists(p):
            with open(p) as f:
                a = json.load(f)
            out["e2e_tracking_fps"] = a.get("fps_tracking", a.get("fps"))
            out["e2e_artifact"] = art
            out["e2e_artifact_mtime"] = time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime(os.path.getmtime(p)))
            break
    print(json.dumps(out))


if __name__ == "__main__":
    main()
