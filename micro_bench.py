"""Focused timing of the full extract step on the current backend (run with -u)."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.models import asdnet
from asdslam_tpu.frontend import extractor as extractor_mod

cfg = SlamConfig()
print("devices:", jax.devices(), flush=True)
H, W = cfg.image_height, cfg.image_width
params = asdnet.init_params(jax.random.PRNGKey(0))
extract = extractor_mod.make_extractor(cfg, lambda p: asdnet.apply(params, p))

imgs = [jax.random.uniform(jax.random.PRNGKey(i), (H, W), jnp.float32) for i in range(4)]
jax.block_until_ready(imgs)
t0 = time.perf_counter()
f = extract(imgs[0]); jax.block_until_ready(f)
print(f"compile+first run: {time.perf_counter()-t0:.1f} s", flush=True)

n = 16
t0 = time.perf_counter()
outs = [extract(imgs[i % 4]) for i in range(n)]
jax.block_until_ready(outs)
print(f"extract varying imgs: {(time.perf_counter()-t0)/n*1000:8.2f} ms/frame", flush=True)

t0 = time.perf_counter()
outs = [extract(imgs[0]) for i in range(n)]
jax.block_until_ready(outs)
print(f"extract same img:     {(time.perf_counter()-t0)/n*1000:8.2f} ms/frame", flush=True)

# per-call blocking (bench.py style)
t0 = time.perf_counter()
for i in range(n):
    jax.block_until_ready(extract(imgs[i % 4]))
print(f"extract blocking:     {(time.perf_counter()-t0)/n*1000:8.2f} ms/frame", flush=True)
