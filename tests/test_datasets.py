import os
import struct
import zlib

import numpy as np

from asdslam_tpu.io import datasets


def write_png_gray(path, img_u8):
    h, w = img_u8.shape
    raw = b"".join(b"\x00" + img_u8[y].tobytes() for y in range(h))
    comp = zlib.compress(raw)

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return c + struct.pack(">I", crc)

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)))
        f.write(chunk(b"IDAT", comp))
        f.write(chunk(b"IEND", b""))


def write_png_rgb_filtered(path, img_u8):
    """RGB PNG using Up filter rows to exercise the filter decoders."""
    h, w, _ = img_u8.shape
    rows = []
    prior = np.zeros(w * 3, np.uint8)
    for y in range(h):
        line = img_u8[y].reshape(-1)
        enc = (line.astype(np.int32) - prior.astype(np.int32)) % 256
        rows.append(b"\x02" + enc.astype(np.uint8).tobytes())
        prior = line
    comp = zlib.compress(b"".join(rows))

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        f.write(chunk(b"IDAT", comp))
        f.write(chunk(b"IEND", b""))


class TestImages:
    def test_png_gray_roundtrip(self, tmp_path):
        img = (np.random.RandomState(0).rand(48, 64) * 255).astype(np.uint8)
        p = os.path.join(tmp_path, "t.png")
        write_png_gray(p, img)
        out = datasets.load_image_gray(p)
        np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)

    def test_png_rgb_up_filter(self, tmp_path):
        img = (np.random.RandomState(1).rand(16, 20, 3) * 255).astype(np.uint8)
        p = os.path.join(tmp_path, "t.png")
        write_png_rgb_filtered(p, img)
        out = datasets.load_image_gray(p)
        expect = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]) / 255.0
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_pgm(self, tmp_path):
        img = (np.random.RandomState(2).rand(10, 12) * 255).astype(np.uint8)
        p = os.path.join(tmp_path, "t.pgm")
        with open(p, "wb") as f:
            f.write(b"P5\n12 10\n255\n")
            f.write(img.tobytes())
        out = datasets.load_image_gray(p)
        np.testing.assert_allclose(out, img / 255.0, atol=1e-6)


class TestCamInfo:
    def test_parse(self, tmp_path):
        p = os.path.join(tmp_path, "cam.txt")
        with open(p, "w") as f:
            f.write("718.856,718.856,607.1928,185.2157,0,0,0,0\n")
            f.write("1,0,0,0.1,0,1,0,0.2,0,0,1,0.3\n")
        info = datasets.read_cam_info(p)
        assert abs(info["fx"] - 718.856) < 1e-6
        assert abs(info["cy"] - 185.2157) < 1e-6
        np.testing.assert_allclose(info["Tbc"][:3, 3], [0.1, 0.2, 0.3])

    def test_kitti_sequence_layout(self, tmp_path):
        seq = os.path.join(tmp_path, "00")
        os.makedirs(os.path.join(seq, "image_0"))
        with open(os.path.join(seq, "times.txt"), "w") as f:
            f.write("0.0\n0.1\n")
        img = (np.random.RandomState(3).rand(8, 8) * 255).astype(np.uint8)
        for i in range(2):
            write_png_gray(os.path.join(seq, "image_0", f"{i:06d}.png"), img)
        s = datasets.KittiSequence(seq)
        assert len(s) == 2
        ts, im = s[1]
        assert ts == 0.1 and im.shape == (8, 8)
