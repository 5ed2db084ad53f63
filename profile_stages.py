"""Per-stage timing of the front-end on the current backend (TPU or CPU)."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.frontend import extractor as extractor_mod
from asdslam_tpu.models import asdnet
from asdslam_tpu.ops import fast, pyramid, patches as patches_mod, match

cfg = SlamConfig()
print("devices:", jax.devices())
img = jax.random.uniform(jax.random.PRNGKey(0), (cfg.image_height, cfg.image_width), jnp.float32)
img = jax.device_put(img)


def bench(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:30s} {dt:8.2f} ms")
    return out


# full pyramid
pyr_fn = jax.jit(lambda im: pyramid.build_pyramid(im, cfg.n_levels, cfg.scale_factor))
levels = bench("pyramid(8)", pyr_fn, img)

# FAST on level 0 only
f0 = jax.jit(lambda im: fast.detect_level(im, 20/255., 7/255., 500, cfg.cell_size, 4, cfg.edge_margin))
bench("fast level0", f0, levels[0])

# full detect across levels (pyramid+fast+angle+patches, no desc)
budgets = extractor_mod.level_budgets(cfg)
@jax.jit
def detect_all(im):
    lv = pyramid.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
    outs = []
    for li, l in enumerate(lv):
        xy, sc, va = fast.detect_level(l, 20/255., 7/255., budgets[li], cfg.cell_size, 4, cfg.edge_margin)
        ang = patches_mod.ic_angle(l, xy, radius=cfg.orientation_radius)
        bl = pyramid.gaussian_blur(l)
        pat = patches_mod.extract_rotated_patches(bl, xy, jnp.zeros_like(ang), size=cfg.patch_size)
        outs.append(pat)
    return jnp.concatenate(outs, 0)
pat = bench("detect+patches(all lvls)", detect_all, img)

# asdnet alone on 2000 patches
params = asdnet.init_params(jax.random.PRNGKey(0))
desc_fn = jax.jit(lambda p: asdnet.apply(params, p))
desc = bench("asdnet(2000)", desc_fn, pat)

# full extractor
extract = extractor_mod.make_extractor(cfg, lambda p: asdnet.apply(params, p))
feats = bench("full extract", extract, img)

# matcher
bench("match window", jax.jit(lambda a, b: match.search_window(
    a.desc, b.desc, a.uv_und, b.uv_und, a.valid, b.valid,
    radius=100.0, max_dist=1.0, ratio=0.9,
    angles_a=a.angle, angles_b=b.angle, check_rotation=True)), feats, feats)

# host->device transfer cost of one image
import numpy as np
him = np.asarray(img)
t0 = time.perf_counter()
for _ in range(10):
    jax.device_put(him).block_until_ready()
print(f"{'h2d image':30s} {(time.perf_counter()-t0)/10*1000:8.2f} ms")
