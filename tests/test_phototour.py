"""PhotoTour data-pipeline validation on a synthetic on-disk fixture.

The reference trains on UBC PhotoTour (liberty/notredame/yosemite —
torchvision layout: patchesNNNN.bmp tiles of 16x16 64px patches + info.txt
3D-point ids + m50_*.txt eval pair lists, ASDNet.py:119-195, 503-537).  The
real dataset is absent in this environment, so this test builds a tiny
byte-exact fixture (8-bit palette BMPs, info.txt, m50 list) and drives the
FULL loader -> pair-sampler -> trainer -> FPR@95 path through it."""

import os
import struct

import numpy as np
import jax
import pytest

from asdslam_tpu.models import train as T


def write_bmp8(path, img):
    """Minimal 8-bit palette grayscale BMP writer (bottom-up, padded rows)."""
    h, w = img.shape
    stride = (w + 3) & ~3
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = img
    pixel_data = rows[::-1].tobytes()  # bottom-up
    off = 14 + 40 + len(palette)
    header = (b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                            len(pixel_data), 2835, 2835, 256, 0))
    with open(path, "wb") as f:
        f.write(header + palette + pixel_data)


@pytest.fixture(scope="module")
def phototour_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("liberty")
    rng = np.random.default_rng(3)
    # 2 tiles x (4x4 grid of 64x64) = 32 patches; 3D point ids repeat so
    # every point has >= 2 patches (matched pairs exist)
    n_patches = 32
    ids = np.repeat(np.arange(16), 2)
    patches = np.zeros((n_patches, 64, 64), np.uint8)
    for pid in range(16):
        base = rng.integers(0, 200, (64, 64))
        for k in range(2):
            jittered = np.clip(base + rng.integers(0, 30, (64, 64)), 0, 255)
            patches[2 * pid + k] = jittered
    for t in range(2):
        tile = np.zeros((4 * 64, 4 * 64), np.uint8)
        for r in range(4):
            for c in range(4):
                tile[r * 64:(r + 1) * 64, c * 64:(c + 1) * 64] = \
                    patches[t * 16 + r * 4 + c]
        write_bmp8(os.path.join(root, f"patches{t:04d}.bmp"), tile)
    np.savetxt(os.path.join(root, "info.txt"),
               np.stack([ids, np.zeros_like(ids)], 1), fmt="%d")
    # m50-style pair list: id1 3dpt1 unused id2 3dpt2 unused
    rows = []
    for i in range(0, n_patches, 2):
        rows.append([i, ids[i], 0, i + 1, ids[i + 1], 0])           # match
        j = (i + 5) % n_patches
        rows.append([i, ids[i], 0, j, ids[j], 0])                   # mixed
    np.savetxt(os.path.join(root, "m50_32_32_0.txt"),
               np.asarray(rows, np.int64), fmt="%d")
    return str(root), patches, ids


class TestPhotoTourPipeline:
    def test_loader_byte_exact(self, phototour_dir):
        root, patches, ids = phototour_dir
        loaded, lids = T.load_phototour(root)
        assert loaded.shape == (32, 64, 64)
        np.testing.assert_array_equal(lids, ids)
        np.testing.assert_allclose(loaded, patches.astype(np.float32) / 255.0,
                                   atol=1e-6)

    def test_pair_list_reader(self, phototour_dir):
        root, patches, ids = phototour_dir
        i1, i2, is_match = T.read_phototour_pairs(root, "m50_32_32_0.txt")
        assert len(i1) == len(i2) == len(is_match) == 32
        # ground truth: same 3D point id
        np.testing.assert_array_equal(is_match, ids[i1] == ids[i2])
        assert is_match.sum() >= 16

    def test_batch_sampler_matches_same_point(self, phototour_dir):
        root, patches, ids = phototour_dir
        loaded, lids = T.load_phototour(root)
        a, p = T.phototour_batch(jax.random.PRNGKey(0), loaded, lids, 8)
        assert a.shape == (8, 32, 32) and p.shape == (8, 32, 32)
        # anchors and positives are centre crops of DIFFERENT patches of the
        # same 3D point: similar but not identical
        d = np.abs(np.asarray(a) - np.asarray(p)).mean()
        assert 0.0 < d < 0.2, d

    def test_train_steps_run_on_phototour_batches(self, phototour_dir):
        root, patches, ids = phototour_dir
        loaded, lids = T.load_phototour(root)
        from asdslam_tpu.models import asdnet
        params = asdnet.init_params(jax.random.PRNGKey(0))
        opt_state = None
        key = jax.random.PRNGKey(1)
        for step in range(2):
            key, kb, ks = jax.random.split(key, 3)
            a, p = T.phototour_batch(kb, loaded, lids, 16)
            params, opt_state, loss = T.train_step(
                params, opt_state, a, p, ks, 0.1,
                adaptive=True, decor=True, gor=True, augment=True)
        assert np.isfinite(float(loss))