#!/usr/bin/env python3
"""Train ASDNet and commit-ready weights.

Reference protocol (ASDNet/ASDNet/ASDNet.py): adaptive-scale log-sigmoid loss
for the early epochs then plain triplet, in-batch hardest-negative mining
with anchor swap, correlation penalty + global orthogonal regularization,
flip/rot90/random-resized-crop augmentation, FPR@95-recall eval.

Training data: PhotoTour if a local copy exists (--phototour), else matched
patch pairs with exact geometric correspondence from the KITTI proxy world
(models/proxy_pairs.py) — real viewpoint/scale change along the real KITTI
trajectories.

Outputs: weights pickle (consumed by run_slam --asdnet_weights, bench.py and
eval_kitti_proxy --descriptor asd) + FPR@95 comparison against the classical
patch descriptor on the same held-out pairs.

Usage:
  python train_asdnet.py --steps 2000 --out asdnet_weights.pkl
"""

import argparse
import json
import pickle
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--pool", type=int, default=40000,
                    help="pre-generated pair pool size")
    ap.add_argument("--eval_pairs", type=int, default=4000)
    ap.add_argument("--seq", default="00",
                    help="proxy sequence(s), comma-separated: pairs are "
                         "drawn round-robin across sequences (multi-world "
                         "texture/motion diversity — the step toward the "
                         "reference's multi-set PhotoTour regime, "
                         "ASDNet.py:539-561)")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--base_lr", type=float, default=0.5)
    ap.add_argument("--phototour", default="", help="local PhotoTour dir")
    ap.add_argument("--pairs_cache", default="",
                    help="npz path: cache/reuse the generated pair pools")
    ap.add_argument("--out", default="asdnet_weights.pkl")
    ap.add_argument("--report", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import os

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    from asdslam_tpu.models import asdnet, train as T

    rng = np.random.default_rng(0)
    if args.phototour:
        patches, ids = T.load_phototour(args.phototour)
        def draw(n, key):
            return T.phototour_batch(key, patches, ids, n)
        key = jax.random.PRNGKey(0)
        key, k1, k2 = jax.random.split(key, 3)
        pool_a, pool_p = draw(args.pool, k1)
        eval_a, eval_p = draw(args.eval_pairs, k2)
        pool_a, pool_p = np.asarray(pool_a), np.asarray(pool_p)
        eval_a, eval_p = np.asarray(eval_a), np.asarray(eval_p)
    else:
        cache = args.pairs_cache
        if cache and os.path.exists(cache):
            z = np.load(cache)
            pool_a, pool_p = z["pool_a"], z["pool_p"]
            eval_a, eval_p = z["eval_a"], z["eval_p"]
            if "seq_bounds" in z:
                seq_bounds = [tuple(b) for b in z["seq_bounds"]]
            print(f"loaded {len(pool_a)} cached pairs from {cache}", flush=True)
        else:
            from asdslam_tpu.models.proxy_pairs import ProxyPairSource
            seqs = [q.strip() for q in args.seq.split(",") if q.strip()]
            t0 = time.time()
            per = -(-args.pool // len(seqs))
            pools = []
            for q in seqs:
                src = ProxyPairSource(q, scale=args.scale)
                pools.append(src.sample(per))
                print(f"  seq {q}: {per} pairs "
                      f"({time.time() - t0:.0f}s)", flush=True)
            pool_a = np.concatenate([a for a, _ in pools])[:args.pool]
            pool_p = np.concatenate([b for _, b in pools])[:args.pool]
            # per-sequence slice boundaries: batches are drawn WITHIN one
            # sequence (rotating) so in-batch hardest-negative mining stays
            # in-domain — cross-world negatives are trivially separable and
            # starve the mining signal (measured: a mixed-batch multi-seq
            # run scored FPR@95 0.0216 vs 0.0028 for the r4 single-seq
            # checkpoint on the same eval set)
            seq_bounds = []
            off = 0
            for a, _ in pools:
                n_here = min(len(a), args.pool - off)
                if n_here > 0:
                    seq_bounds.append((off, off + n_here))
                off += n_here
            # held-out pairs from a DIFFERENT sampling stream (all seqs)
            per_e = -(-args.eval_pairs // len(seqs))
            evals = [ProxyPairSource(q, scale=args.scale, seed=99).sample(per_e)
                     for q in seqs]
            eval_a = np.concatenate([a for a, _ in evals])[:args.eval_pairs]
            eval_p = np.concatenate([b for _, b in evals])[:args.eval_pairs]
            print(f"pair generation: {time.time() - t0:.0f}s", flush=True)
            if cache:
                np.savez_compressed(cache, pool_a=pool_a, pool_p=pool_p,
                                    eval_a=eval_a, eval_p=eval_p,
                                    seq_bounds=np.asarray(seq_bounds))

    # per-patch standardization mirrors inference (asdnet input whitening)
    params = asdnet.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    opt_state = None
    adaptive_until = args.steps // 2
    seq_bounds = locals().get("seq_bounds") or [(0, len(pool_a))]
    for step in range(args.steps):
        key, ks, kb = jax.random.split(key, 3)
        lo, hi = seq_bounds[step % len(seq_bounds)]
        sel = rng.integers(lo, hi, args.batch)
        a = jnp.asarray(pool_a[sel])
        p = jnp.asarray(pool_p[sel])
        lr = float(T.lr_schedule(step, args.steps, args.base_lr))
        params, opt_state, loss = T.train_step(
            params, opt_state, a, p, ks, lr,
            adaptive=step < adaptive_until, decor=True, gor=True, augment=True)
        if step % 200 == 0:
            print(f"step {step}/{args.steps} loss {float(loss):.4f} "
                  f"{(step + 1) / (time.time() - t0):.1f} steps/s", flush=True)

    # ---- FPR@95 eval: trained ASD vs random ASD vs classical patch desc
    def eval_desc(fn):
        pos, neg = [], []
        B = 1024
        for i in range(0, len(eval_a), B):
            da = np.asarray(fn(jnp.asarray(eval_a[i:i + B])))
            dp = np.asarray(fn(jnp.asarray(eval_p[i:i + B])))
            pos.append(np.linalg.norm(da - dp, axis=1))
            neg.append(np.linalg.norm(da - np.roll(dp, 1, axis=0), axis=1))
        return T.fpr95(np.concatenate(pos), np.concatenate(neg))

    from asdslam_tpu.models import patch_descriptor
    rand_params = asdnet.init_params(jax.random.PRNGKey(7))
    res = {
        "fpr95_asd_trained": round(eval_desc(lambda x: asdnet.apply(params, x)), 4),
        "fpr95_asd_random": round(eval_desc(lambda x: asdnet.apply(rand_params, x)), 4),
        "fpr95_patch_classical": round(eval_desc(patch_descriptor.apply), 4),
        "steps": args.steps, "batch": args.batch,
        "train_pairs": len(pool_a), "eval_pairs": len(eval_a),
        "source": args.phototour or f"kitti_proxy_{args.seq}",
        "base_lr": args.base_lr,
        "train_s": round(time.time() - t0, 1),
    }
    print(json.dumps(res), flush=True)
    with open(args.out, "wb") as f:
        pickle.dump(jax.device_get(params), f)
    print(f"saved weights to {args.out}")
    if args.report:
        with open(args.report, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
