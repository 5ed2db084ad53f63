#!/usr/bin/env python3
"""MFU / roofline accounting for the hot kernels — makes "speed-of-light"
a number instead of a vibe (BASELINE north star: every hot kernel optimized
toward the hardware bound).

For each kernel: analytic FLOPs (formulas inline), analytic minimum HBM
traffic, measured time on the current backend (median of 5 windows of 10
chained calls, one sync per window — the co-located execution model), then
  mfu        = flops / time / PEAK_FLOPS
  bw_util    = bytes / time / PEAK_BW
  roofline   = which bound (compute vs bandwidth) the kernel's arithmetic
               intensity puts it under, and the fraction of that bound
               achieved ("sol_frac" — fraction of speed-of-light).

TPU v5e (1 chip) peaks used: 197 TFLOP/s bf16 matmul, 819 GB/s HBM.
Matmul-free elementwise/gather kernels are bandwidth-bound by construction —
their MFU is meaningless and only bw_util/sol_frac is reported.

Prints one JSON line (drop into MFU_r0N.json).
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

PEAK_FLOPS = 197e12   # v5e bf16
PEAK_BW = 819e9       # v5e HBM bytes/s


def timeit(fn, *args, n=10, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / n)
    return float(np.median(samples))


def entry(name, t, flops, bytes_):
    ai = flops / max(bytes_, 1)                     # arithmetic intensity
    ridge = PEAK_FLOPS / PEAK_BW                    # ~240 flop/byte on v5e
    bound = "compute" if ai > ridge else "bandwidth"
    t_sol = max(flops / PEAK_FLOPS, bytes_ / PEAK_BW)
    return {
        "name": name, "ms": round(t * 1e3, 3),
        "gflops": round(flops / 1e9, 2), "mbytes": round(bytes_ / 1e6, 2),
        "mfu": round(flops / t / PEAK_FLOPS, 4),
        "bw_util": round(bytes_ / t / PEAK_BW, 4),
        "bound": bound,
        "sol_ms": round(t_sol * 1e3, 4),
        "sol_frac": round(t_sol / t, 4),
    }


def asdnet_flops(n_patches):
    """Conv tower FLOPs (models/asdnet.py layer table, ASDNet.py:331-370):
    2 * H * W * Cin * Cout * k^2 per conv."""
    layers = [  # (H, W, Cin, Cout, k)
        (32, 32, 1, 32, 3), (32, 32, 32, 32, 3),
        (16, 16, 32, 64, 3), (16, 16, 64, 64, 3),
        (8, 8, 64, 128, 3), (8, 8, 128, 128, 3),
        (1, 1, 128, 128, 8),
    ]
    per = sum(2 * h * w * ci * co * k * k for h, w, ci, co, k in layers)
    return per * n_patches


def main():
    from asdslam_tpu.config import SlamConfig
    from asdslam_tpu.ops import match
    from asdslam_tpu.models import asdnet
    from asdslam_tpu.frontend import extractor as extractor_mod, track_step as ts
    from asdslam_tpu.backend import ba

    print("devices:", jax.devices(), flush=True)
    cfg = SlamConfig()
    K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
    results = []

    # ---- 1. matcher distance matrices (MXU) ---------------------------- #
    for label, N, M in [("match_motion_2000x2000", 2000, 2000),
                        ("match_localmap_8192x2000", 8192, 2000)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        a = jax.random.normal(ks[0], (N, 128))
        b = jax.random.normal(ks[1], (M, 128))
        uv_a = jax.random.uniform(ks[2], (N, 2), maxval=1200.0)
        uv_b = jax.random.uniform(ks[3], (M, 2), maxval=1200.0)
        f = jax.jit(lambda a, b, ua, ub: match.search_projection(
            a, b, ua, ub, jnp.ones(N, bool), jnp.ones(M, bool),
            jnp.full((N,), 15.0), 1.5, ratio=0.8))
        t = timeit(f, a, b, uv_a, uv_b)
        flops = 2 * N * M * 128
        # inputs (bf16 operands for the matmul) + dist matrix written f32 +
        # re-read twice (best + second-best passes) + window mask pass
        bytes_ = 2 * (N + M) * 128 + 4 * N * M * 4
        results.append(entry(label, t, flops, bytes_))

    # ---- 2. ASDNet descriptor forward (MXU convs) ---------------------- #
    n_p = cfg.n_features
    params = asdnet.init_params(jax.random.PRNGKey(0))
    patches = jax.random.uniform(jax.random.PRNGKey(1), (n_p, 32, 32))
    f = jax.jit(lambda p: asdnet.apply(params, p))
    t = timeit(f, patches)
    flops = asdnet_flops(n_p)
    # activations dominate: in+out per layer, bf16 compute path
    act = n_p * (32 * 32 * (1 + 32 + 32) + 16 * 16 * (64 + 64)
                 + 8 * 8 * (128 + 128) + 128)
    results.append(entry("asdnet_forward_2000x32x32", t, flops, act * 2))

    # ---- 3. local BA at the reference window shape --------------------- #
    C = cfg.local_ba_max_kfs + cfg.local_ba_max_fixed
    Pt, O = 4096, 16384
    kb = jax.random.split(jax.random.PRNGKey(9), 3)
    pts = jax.random.uniform(kb[0], (Pt, 3), minval=-5.0, maxval=5.0) + jnp.array([0., 0., 10.])
    poses7 = jnp.tile(jnp.array([1., 0., 0., 0., 0., 0., 0.]), (C, 1))
    cam_idx = jax.random.randint(kb[1], (O,), 0, C).astype(jnp.int32)
    pt_idx = jax.random.randint(kb[2], (O,), 0, Pt).astype(jnp.int32)
    uv = jnp.stack([K[0, 0] * pts[pt_idx, 0] / pts[pt_idx, 2] + K[0, 2],
                    K[1, 1] * pts[pt_idx, 1] / pts[pt_idx, 2] + K[1, 2]], 1)
    obs = ba.Obs(cam_idx=cam_idx, pt_idx=pt_idx, uv=uv,
                 inv_sigma2=jnp.ones(O), valid=jnp.ones(O, bool))
    pt_obs = jnp.asarray(ba.build_pt_obs(np.asarray(pt_idx), np.ones(O, bool), Pt, 16))
    prob = ba.BAProblem(poses7=poses7, points=pts, pt_valid=jnp.ones(Pt, bool),
                        obs=obs, pt_obs=pt_obs)
    iters = 15
    f = lambda prob: ba.bundle_adjust(prob, K, n_opt=cfg.local_ba_max_kfs, iters=iters)
    t = timeit(f, prob, n=3, reps=3)
    # per iter: residual/Jacobian (~500 flop/obs), per-obs outer products
    # Jc'Jc etc (~1.3k flop/obs), landmark 3x3 solve (~100/pt), reduced
    # system build W'HppW (~324 flop per (obs,cam-pair)) + dense solve
    no = cfg.local_ba_max_kfs * 6
    flops = iters * (O * 2000 + Pt * 150 + O * no * 40 + no ** 3 // 3)
    bytes_ = iters * (O * (2 + 12 + 6 + 18) * 4 * 3 + Pt * 9 * 4 * 2)
    results.append(entry(f"local_ba_{C}c_{Pt}p_{O}o_15it", t, flops, bytes_))

    # ---- 4. fused tracking step (aggregate) ---------------------------- #
    extract = extractor_mod.make_extractor(cfg, lambda p: asdnet.apply(params, p))
    fused = ts.make_track_step(cfg, K, extract)
    N, P = cfg.n_features, cfg.local_ba_max_points
    kk = jax.random.split(jax.random.PRNGKey(7), 4)
    img = jax.random.uniform(kk[3], (cfg.image_height, cfg.image_width))
    feat0 = extract(img)
    geom = ts.GeomBlock(
        pos=jax.random.uniform(kk[0], (N, 3), minval=-10., maxval=10.) + jnp.array([0., 0., 15.]),
        normal=jnp.tile(jnp.array([0., 0., -1.]), (N, 1)),
        min_dist=jnp.full((N,), 2.0), max_dist=jnp.full((N,), 80.0),
        valid=jnp.ones((N,), bool))
    cand = ts.PointBlock(
        pos=jax.random.uniform(kk[1], (P, 3), minval=-10., maxval=10.) + jnp.array([0., 0., 15.]),
        normal=jnp.tile(jnp.array([0., 0., -1.]), (P, 1)),
        min_dist=jnp.full((P,), 2.0), max_dist=jnp.full((P,), 80.0),
        desc=jax.random.normal(kk[2], (P, cfg.descriptor_dim)) * 0.1,
        valid=jnp.ones((P,), bool))
    pose0 = jnp.array([1., 0., 0., 0., 0., 0., 0.])
    vel0 = jnp.array([1., 0., 0., 0., 0., 0., 0.3])

    def step(img, pose, vel, feat, geom):
        f2, res = fused(img, pose, vel, feat, geom, cand, jnp.zeros((P,), bool))
        return res.pose

    t = timeit(step, img, pose0, vel0, feat0, geom, n=5, reps=3)
    # aggregate: ASDNet + 2 matchers + 8 pose-opt rounds (tiny) + pyramid
    flops = (asdnet_flops(N) + 2 * N * N * 128 + 2 * P * N * 128
             + 8 * 10 * N * 600)
    img_b = cfg.image_height * cfg.image_width * 4 * 10  # 8-level pyramid passes
    bytes_ = img_b + 2 * (N * N + P * N) * 4 * 3
    results.append(entry("fused_track_step", t, flops, bytes_))

    print(json.dumps({"metric": "mfu_roofline", "peak_flops_bf16": PEAK_FLOPS,
                      "peak_bw": PEAK_BW, "kernels": results}))


if __name__ == "__main__":
    main()
