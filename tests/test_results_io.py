"""Tests for result dumps (saveResult parity), readers, vocab persistence,
debug info, and the PhotoTour raw-layout loader."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.io import results, synthetic
from asdslam_tpu.loop import vocab as vocab_mod
from asdslam_tpu import system as system_mod


@pytest.fixture(scope="module")
def small_system():
    cfg = SlamConfig(image_width=320, image_height=240, n_features=512,
                     n_levels=4, fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                     local_ba_max_points=256, local_ba_max_obs=1024)
    K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]],
                 np.float32)
    frames, _ = synthetic.render_sequence(
        K, n_frames=10, height=240, width=320, step=0.25)
    sys_ = system_mod.System(cfg)
    for i in range(10):
        sys_.track_monocular(frames[i], i)
    assert sys_.stats()["n_keyframes"] >= 2
    return sys_


def test_save_result_roundtrip(small_system, tmp_path):
    out = str(tmp_path / "result")
    small_system.save_result(out)
    for name in ("traj", "track", "posi", "kps", "desc"):
        assert os.path.exists(os.path.join(out, name + ".txt"))

    poses, names, ids = results.read_traj_file(os.path.join(out, "traj.txt"))
    s = small_system.store
    n_kf = int(s.kf_valid.sum())
    assert len(poses) == n_kf
    # first pose is written relative to itself -> identity
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-5)

    posi = results.read_mp_posi(os.path.join(out, "posi.txt"))
    tracks = results.read_track_info(os.path.join(out, "track.txt"))
    assert len(posi) == len(tracks)
    uv, octv, fnames = results.read_kp_info(os.path.join(out, "kps.txt"))
    desc = results.read_desc(os.path.join(out, "desc.txt"))
    assert len(uv) == len(desc) == len(octv)
    # every track index points into the descriptor list
    for t in tracks:
        assert len(t) >= 3
        assert max(t) < len(desc)
    if len(desc):
        assert desc.shape[1] == 128


def test_misc_readers(tmp_path):
    p = tmp_path / "imu.txt"
    p.write_text("0.1,0,0,0.1,9.8,0,0\n0.2,0,0,0.2,9.8,0,0\n")
    imu = results.read_imu_data(str(p))
    assert imu.shape == (2, 7)

    g = tmp_path / "gps.txt"
    g.write_text("1.0,2.0,3.0\n0.5,10,20,30,4\n")
    posis, times, covs, anchor = results.read_gps_orth(str(g))
    np.testing.assert_allclose(anchor, [1.0, 2.0, 3.0])
    assert posis.shape == (1, 3) and covs[0] == 4

    t = tmp_path / "imgtime.txt"
    t.write_text("a.png,0.5\nb.png,0.7\n")
    times, names = results.read_img_time(str(t))
    assert names == ["a.png", "b.png"]
    np.testing.assert_allclose(times, [0.5, 0.7])


def test_debug_info(small_system):
    info, proj, obs, ok = small_system.debug_info()
    assert info["n_matches"] > 0
    assert np.isfinite(info["mean_reproj_err"])
    # a converged synthetic map reprojects tightly
    assert info["mean_reproj_err"] < 5.0


def test_vocab_save_load(tmp_path):
    key = jax.random.PRNGKey(0)
    descs = jax.random.normal(key, (2000, 128))
    descs = descs / jnp.linalg.norm(descs, axis=1, keepdims=True)
    voc = vocab_mod.train_vocab(key, descs, branching=4, depth=3)
    path = str(tmp_path / "voc.npz")
    vocab_mod.save_vocab(voc, path)
    voc2 = vocab_mod.load_vocab(path)
    assert voc2.branching == 4 and voc2.depth == 3
    w1 = np.asarray(vocab_mod.transform(voc, descs[:64]))
    w2 = np.asarray(vocab_mod.transform(voc2, descs[:64]))
    np.testing.assert_array_equal(w1, w2)


def test_phototour_loader(tmp_path):
    from asdslam_tpu.models import train as train_mod

    # synthesize a tiny 8-bit BMP "patches" tile (128x128 = 2x2 patches)
    rng = np.random.default_rng(0)
    w = h = 128
    img = rng.integers(0, 255, (h, w), dtype=np.uint8)
    stride = (w + 3) & ~3
    off = 14 + 40 + 256 * 4
    header = (b"BM" + (off + stride * h).to_bytes(4, "little") + b"\0\0\0\0"
              + off.to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
              + b"\0" * 24)
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = img[::-1]
    (tmp_path / "patches0001.bmp").write_bytes(header + palette + rows.tobytes())
    # 4 patches: two 3D points with two patches each
    (tmp_path / "info.txt").write_text("7 0\n7 0\n9 0\n9 0\n")

    patches, ids = train_mod.load_phototour(str(tmp_path))
    assert patches.shape == (4, 64, 64)
    np.testing.assert_array_equal(ids, [7, 7, 9, 9])
    np.testing.assert_allclose(patches[0], img[:64, :64] / 255.0, atol=1e-6)

    a, p = train_mod.phototour_batch(jax.random.PRNGKey(1), patches, ids, 8)
    assert a.shape == (8, 32, 32) and p.shape == (8, 32, 32)


def test_tracer():
    from asdslam_tpu.utils.tracing import Tracer
    import time as _t

    tr = Tracer()
    with tr.span("a"):
        with tr.span("b"):
            _t.sleep(0.01)
    with tr.span("a"):
        pass
    assert tr.spans["a"].count == 2
    assert tr.spans["a/b"].count == 1
    assert tr.spans["a"].total >= 0.01
    rep = tr.report()
    assert "a/b" in rep
    d = tr.as_dict()
    assert d["a"]["count"] == 2
    # disabled tracer records nothing
    off = Tracer(enabled=False)
    with off.span("x"):
        pass
    assert not off.spans
