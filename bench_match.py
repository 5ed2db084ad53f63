"""A/B microbenchmark: jnp distance-matrix matcher vs fused Pallas matcher
(ops/pallas_match.masked_nn) at the two hot shapes of the fused track step:

- motion stage:    A = 2000 prev features  -> B = 2000 current features
- local-map stage: A = 8192 map candidates -> B = 2000 current features

The jnp path materializes the [N, M] f32 distance matrix in HBM plus several
masked passes over it; the Pallas kernel keeps tiles in VMEM.  Run on the
real TPU; prints ms/call (median of 5 windows of 20 chained calls)."""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from asdslam_tpu.ops import match


def time_fn(fn, *args, n=20, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / n * 1000.0)
    return float(np.median(samples))


def main():
    print("devices:", jax.devices(), flush=True)
    for label, N, M in [("motion 2000x2000", 2000, 2000),
                        ("localmap 8192x2000", 8192, 2000)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        desc_a = jax.random.normal(ks[0], (N, 128))
        desc_a = desc_a / jnp.linalg.norm(desc_a, axis=1, keepdims=True)
        desc_b = jax.random.normal(ks[1], (M, 128))
        desc_b = desc_b / jnp.linalg.norm(desc_b, axis=1, keepdims=True)
        uv_a = jax.random.uniform(ks[2], (N, 2), minval=0, maxval=1200)
        uv_b = jax.random.uniform(ks[3], (M, 2), minval=0, maxval=1200)
        valid_a = jnp.ones((N,), bool)
        valid_b = jnp.ones((M,), bool)
        lvl_a = jax.random.randint(ks[4], (N,), 0, 8)
        lvl_b = jax.random.randint(ks[5], (M,), 0, 8)
        radius = jnp.full((N,), 15.0)

        args = (desc_a, desc_b, uv_a, uv_b, valid_a, valid_b, radius, 1.5)
        kw = dict(ratio=0.8, pred_level_a=lvl_a, levels_b=lvl_b)
        t_jnp = time_fn(lambda *a: match.search_projection(*a, **kw), *args)
        t_pal = time_fn(
            lambda *a: match.search_projection(*a, use_pallas=True, **kw), *args)
        print(f"{label}: jnp {t_jnp:.3f} ms  pallas {t_pal:.3f} ms  "
              f"speedup {t_jnp / t_pal:.2f}x", flush=True)


if __name__ == "__main__":
    main()
