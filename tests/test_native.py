"""Native C++ runtime components: map serializer round-trips (cross-checked
against the pure-Python writer/reader byte-for-byte) and the threaded
prefetch loader."""

import os
import zlib
import struct

import numpy as np
import pytest

from asdslam_tpu.mapping import persistence as P
from asdslam_tpu.native import loader as native


def _sample_map(with_imu=False):
    d = P.VisualMapData()
    d.gps_anchor = np.array([1.0, 2.0, 3.0])
    d.tbc_posi = np.array([0.1, 0.2, 0.3], np.float32)
    d.tbc_quat = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    d.mp_positions = np.arange(15, dtype=np.float32).reshape(5, 3)
    rng = np.random.RandomState(0)
    for i in range(3):
        n = 4 + i
        d.frames.append(dict(
            file_name=f"img_{i}.png", time_stamp=100.0 + i,
            position=rng.randn(3).astype(np.float32),
            direction=np.array([1, 0, 0, 0], np.float32),
            fx=718.0, fy=718.0, cx=607.0, cy=185.0,
            k1=0.0, k2=0.0, p1=0.0, p2=0.0, width=1241, height=376,
            gps_position=np.zeros(3, np.float32), gps_accu=9999.0,
            kps=rng.rand(n, 2).astype(np.float32) * 100,
            obs_mp=rng.randint(-1, 5, n).astype(np.int32),
            octave=rng.randint(0, 8, n).astype(np.int32),
            descriptors=rng.randn(n, 128).astype(np.float32),
            imu=[(tuple(rng.randn(3).astype(np.float32)),
                  tuple(rng.randn(3).astype(np.float32)), 99.5)] if with_imu else [],
            imu_next_frame=-1))
    E = 2
    d.edge_posi = rng.randn(E, 3).astype(np.float32)
    d.edge_quat = np.tile(np.array([1, 0, 0, 0], np.float32), (E, 1))
    d.edge_scale = np.ones(E, np.float32)
    d.edge_weight = np.full(E, 30.0, np.float32)
    d.edge_v1 = np.array([0, 1], np.int32)
    d.edge_v2 = np.array([1, 2], np.int32)
    return d


def _assert_maps_equal(a, b):
    np.testing.assert_allclose(a.gps_anchor, b.gps_anchor)
    np.testing.assert_allclose(a.mp_positions, b.mp_positions)
    assert len(a.frames) == len(b.frames)
    for fa, fb in zip(a.frames, b.frames):
        assert fa["file_name"] == fb["file_name"]
        assert fa["time_stamp"] == fb["time_stamp"]
        np.testing.assert_allclose(fa["kps"], fb["kps"])
        np.testing.assert_array_equal(fa["obs_mp"], fb["obs_mp"])
        np.testing.assert_array_equal(fa["octave"], fb["octave"])
        np.testing.assert_allclose(fa["descriptors"], fb["descriptors"])
        assert fa["imu_next_frame"] == fb["imu_next_frame"]
        assert len(fa["imu"]) == len(fb["imu"])
    np.testing.assert_array_equal(a.edge_v1, b.edge_v1)
    np.testing.assert_allclose(a.edge_weight, b.edge_weight)


@pytest.fixture(scope="module")
def have_native():
    if not native.native_available():
        pytest.skip("native toolchain unavailable")


def test_native_save_matches_python_bytes(tmp_path, have_native):
    d = _sample_map()
    p_native = str(tmp_path / "n.map")
    p_python = str(tmp_path / "p.map")
    assert native.map_save_native(p_native, d)
    P.save_visual_map(d, p_python, use_native=False)
    assert open(p_native, "rb").read() == open(p_python, "rb").read()


def test_native_load_roundtrip(tmp_path, have_native):
    d = _sample_map()
    path = str(tmp_path / "m.map")
    assert native.map_save_native(path, d)
    back = native.map_load_native(path)
    assert back is not None
    _assert_maps_equal(d, back)


def test_native_load_reads_python_written_imu(tmp_path, have_native):
    d = _sample_map(with_imu=True)
    path = str(tmp_path / "imu.map")
    P.save_visual_map(d, path, use_native=False)  # native writer skips IMU
    back = native.map_load_native(path)
    assert back is not None
    _assert_maps_equal(d, back)
    assert back.frames[0]["imu"][0][2] == 99.5


def _write_png_gray(path, img):
    """Minimal grayscale 8-bit PNG writer for test fixtures."""
    h, w = img.shape

    def chunk(tag, payload):
        out = struct.pack(">I", len(payload)) + tag + payload
        return out + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def test_prefetch_loader_ordered(tmp_path, have_native):
    h, w = 24, 32
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(10)]
    paths = []
    for i, im in enumerate(imgs):
        p = str(tmp_path / f"{i:06d}.png")
        _write_png_gray(p, im)
        paths.append(p)
    ld = native.PrefetchLoader(paths, h, w, n_threads=3, capacity=4)
    got = list(ld)
    ld.close()
    assert len(got) == 10
    for im, fr in zip(imgs, got):
        np.testing.assert_allclose(fr, im.astype(np.float32) / 255.0, atol=1e-6)


def test_prefetch_loader_wraparound_race(tmp_path, have_native):
    """Regression: a worker holding frame idx+capacity could steal a
    still-initial slot ahead of the displaced frame's worker, deadlocking
    consumer and worker (prefetch.cc free_cv predicate).  Small ring + more
    threads than capacity + many frames maximizes wrap-around pressure."""
    h, w = 8, 8
    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(64)]
    paths = []
    for i, im in enumerate(imgs):
        p = str(tmp_path / f"{i:06d}.png")
        _write_png_gray(p, im)
        paths.append(p)
    for _ in range(5):
        ld = native.PrefetchLoader(paths, h, w, n_threads=6, capacity=2)
        got = list(ld)
        ld.close()
        assert len(got) == 64
        for im, fr in zip(imgs, got):
            np.testing.assert_allclose(fr, im.astype(np.float32) / 255.0,
                                       atol=1e-6)
