#!/usr/bin/env python3
"""Offline vocabulary training tool.

The reference ships a corpus-trained DBoW2 vocabulary (small_voc.yml.gz,
loaded via --voc_addr in run_vslam_kitti.sh; training entry
src/dbow2/DBoW2/TemplatedVocabulary.h:1347-1455).  This tool reproduces that
workflow TPU-natively: collect descriptors from one or more saved .map
checkpoints (or raw result dirs), train the k-means tree on device, save as
.npz for --voc_addr.

Examples:
  python train_vocab.py --map_addr chamo.map --out voc.npz
  python train_vocab.py --map_addr a.map --map_addr b.map --out voc.npz \
      --branching 10 --depth 4
"""

import argparse

import numpy as np


def collect_descriptors_from_map(path: str) -> np.ndarray:
    from asdslam_tpu.mapping import persistence

    data = persistence.load_visual_map(path)
    descs = []
    for fr in data.frames:
        d = np.asarray(fr["descriptors"], np.float32)
        if len(d):
            descs.append(d)
    if not descs:
        return np.zeros((0, 128), np.float32)
    return np.concatenate(descs, axis=0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--map_addr", action="append", required=True,
                   help="saved .map checkpoint(s) to harvest descriptors from")
    p.add_argument("--out", required=True, help="output vocabulary .npz")
    p.add_argument("--branching", type=int, default=10)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--max_descriptors", type=int, default=200000,
                   help="subsample cap (uniform) for k-means training")
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from asdslam_tpu.loop import vocab as vocab_mod

    D = np.concatenate([collect_descriptors_from_map(m) for m in args.map_addr])
    # drop zero rows (padding)
    D = D[np.linalg.norm(D, axis=1) > 1e-6]
    if len(D) < 1000:
        raise SystemExit(f"too few descriptors ({len(D)}) to train a vocabulary")
    if len(D) > args.max_descriptors:
        sel = np.random.default_rng(args.seed).choice(
            len(D), args.max_descriptors, replace=False)
        D = D[sel]
    print(f"training {args.branching}^{args.depth} vocabulary "
          f"on {len(D)} descriptors")
    v = vocab_mod.train_vocab(jax.random.PRNGKey(args.seed), jnp.asarray(D),
                              branching=args.branching, depth=args.depth)
    vocab_mod.save_vocab(v, args.out)
    print(f"saved {v.n_words}-word vocabulary to {args.out}")


if __name__ == "__main__":
    main()
