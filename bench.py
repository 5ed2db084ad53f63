"""Benchmark: SLAM front-end throughput on one TPU chip.

Measures the full per-frame front-end step at the reference workload shape
(1241x376 KITTI image, 2000 features, 8 pyramid levels, ASDNet descriptors —
run_vslam_kitti.sh defaults) plus frame-to-frame matching.  Prints ONE JSON
line: frames/s vs the 30 fps target (= 3x a nominal 10 fps CPU reference,
per BASELINE.md: the reference publishes no fps numbers; its tracking loop is
single-threaded CPU + cuDNN descriptor).
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    from asdslam_tpu.config import SlamConfig
    from asdslam_tpu.frontend import extractor as extractor_mod
    from asdslam_tpu.models import asdnet
    from asdslam_tpu.ops import match
    from asdslam_tpu.io import synthetic

    cfg = SlamConfig()  # KITTI defaults: 2000 features, 8 levels, 1241x376
    K = jnp.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]], jnp.float32)
    params = asdnet.init_params(jax.random.PRNGKey(0))
    desc_fn = lambda patches: asdnet.apply(params, patches)
    extract = extractor_mod.make_extractor(cfg, desc_fn)

    # pre-render frames (rendering excluded from timing)
    frames, poses = synthetic.render_sequence(
        K, n_frames=6, height=cfg.image_height, width=cfg.image_width, step=0.3)
    frames = [frames[i] for i in range(6)]

    def frame_step(img, prev):
        f = extract(img)
        if prev is not None:
            idx, d, ok = match.search_window(
                prev.desc, f.desc, prev.uv_und, f.uv_und, prev.valid, f.valid,
                radius=100.0, max_dist=1.0, ratio=0.9,
                angles_a=prev.angle, angles_b=f.angle, check_rotation=True)
            ok.block_until_ready()
        else:
            f.desc.block_until_ready()
        return f

    # warmup / compile
    prev = None
    for i in range(2):
        prev = frame_step(frames[i], prev)

    n_timed = 20
    t0 = time.perf_counter()
    for i in range(n_timed):
        prev = frame_step(frames[2 + (i % 4)], prev)
    dt = time.perf_counter() - t0
    fps = n_timed / dt

    baseline_fps = 30.0  # 3x nominal 10 fps CPU reference (BASELINE.md target)
    print(json.dumps({
        "metric": "frontend_fps_kitti_shape",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
