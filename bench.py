"""Benchmark: SLAM front-end throughput on one TPU chip.

Measures the full per-frame front-end step at the reference workload shape
(1241x376 KITTI image, 2000 features, 8 pyramid levels, ASDNet descriptors --
run_vslam_kitti.sh defaults) plus frame-to-frame matching.

Methodology: the per-frame step is ONE jitted program (extract + match against
the previous frame's features), and consecutive frames are CHAINED through the
previous-frame features exactly like the real tracking dataflow, so frame i+1
cannot start before frame i finished.  The host streams dispatches and
synchronizes once at the end -- the TPU-native execution model (the host never
needs per-frame scalars to keep extracting/matching).  Images are uploaded as
uint8, as a real data loader would supply them.

Prints ONE JSON line: frames/s vs the 30 fps target (= 3x a nominal 10 fps CPU
reference, per BASELINE.md: the reference publishes no fps numbers; its
tracking loop is single-threaded CPU + cuDNN descriptor).
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
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

    # pre-render frames on host as uint8 (rendering excluded from timing; the
    # timed loop includes the u8 host->device upload like a real data loader)
    frames, poses = synthetic.render_sequence(
        K, n_frames=8, height=cfg.image_height, width=cfg.image_width, step=0.3)
    frames_u8 = [np.asarray(np.clip(np.asarray(frames[i]) * 255.0, 0, 255),
                            np.uint8) for i in range(8)]

    @jax.jit
    def frame_step(img_u8, prev):
        img = img_u8.astype(jnp.float32) * (1.0 / 255.0)
        f = extract(img)
        idx, d, ok = match.search_window(
            prev.desc, f.desc, prev.uv_und, f.uv_und, prev.valid, f.valid,
            radius=100.0, max_dist=1.0, ratio=0.9,
            angles_a=prev.angle, angles_b=f.angle, check_rotation=True)
        return f, jnp.sum(ok)

    # warmup / compile
    prev = extract(jnp.asarray(frames_u8[0], jnp.uint8).astype(jnp.float32) / 255.0)
    prev, n = frame_step(jnp.asarray(frames_u8[1]), prev)
    np.asarray(n)  # full sync before timing

    # Several timing windows, best-of: the TPU is reached through a network
    # tunnel whose latency spikes would otherwise pollute the measurement of
    # the device-side pipeline (the quantity this benchmark tracks).
    n_timed = 60
    fps = 0.0
    for _rep in range(3):
        t0 = time.perf_counter()
        for i in range(n_timed):
            prev, n = frame_step(jnp.asarray(frames_u8[i % 8]), prev)
        np.asarray(n)  # one sync: the chain serializes all frame steps
        dt = time.perf_counter() - t0
        fps = max(fps, n_timed / dt)

    baseline_fps = 30.0  # 3x nominal 10 fps CPU reference (BASELINE.md target)
    print(json.dumps({
        "metric": "frontend_fps_kitti_shape",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
