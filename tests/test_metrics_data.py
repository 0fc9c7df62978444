import os

import jax.numpy as jnp
import numpy as np
import pytest

from stf_tpu.datasets import ImageFolder, load_image
from stf_tpu.utils.metrics import ms_ssim, psnr, ssim


class TestMetrics:
    def test_psnr_known_value(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)

    def test_ssim_identity(self):
        x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
        assert float(ssim(x, x)) > 0.9999

    def test_ms_ssim_identity(self):
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 192, 192, 3)), jnp.float32
        )
        assert float(ms_ssim(x, x)) > 0.9999

    def test_ms_ssim_ordering(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 192, 192, 3)), jnp.float32)
        small = x + 0.01 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        large = x + 0.2 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        assert float(ms_ssim(x, small)) > float(ms_ssim(x, large))

    def test_ms_ssim_matches_pytorch_msssim_formula(self):
        """Cross-check against an independent torch implementation of the
        same standard (pool->ssim per scale, product with exponents)."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(2)
        x = rng.random((1, 192, 208, 3)).astype(np.float32)
        y = np.clip(
            x + 0.05 * rng.standard_normal(x.shape).astype(np.float32), 0, 1
        )

        ours = float(ms_ssim(jnp.asarray(x), jnp.asarray(y)))

        # independent torch reference
        def tblur(t, win):
            C = t.shape[1]
            k = torch.from_numpy(win).reshape(1, 1, -1, 1).repeat(C, 1, 1, 1)
            t = F.conv2d(t, k, groups=C)
            t = F.conv2d(t, k.transpose(2, 3), groups=C)
            return t

        def tssim(a, b, win):
            c1, c2 = 0.01 ** 2, 0.03 ** 2
            mu_a, mu_b = tblur(a, win), tblur(b, win)
            saa = tblur(a * a, win) - mu_a ** 2
            sbb = tblur(b * b, win) - mu_b ** 2
            sab = tblur(a * b, win) - mu_a * mu_b
            cs = (2 * sab + c2) / (saa + sbb + c2)
            s = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1) * cs
            return s.mean().item(), cs.mean().item()

        gx = np.arange(11, dtype=np.float64) - 5
        win = np.exp(-(gx ** 2) / (2 * 1.5 ** 2))
        win = (win / win.sum()).astype(np.float32)
        weights = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]
        a = torch.from_numpy(x.transpose(0, 3, 1, 2))
        b = torch.from_numpy(y.transpose(0, 3, 1, 2))
        vals = []
        for i in range(5):
            s, cs = tssim(a, b, win)
            if i < 4:
                vals.append(max(cs, 0.0))
                a = F.avg_pool2d(a, 2)
                b = F.avg_pool2d(b, 2)
        vals.append(max(s, 0.0))
        expected = float(np.prod([v ** w for v, w in zip(vals, weights)]))
        np.testing.assert_allclose(ours, expected, rtol=1e-3)


class TestImageFolder:
    @pytest.fixture
    def dataset_dir(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(0)
        for split in ("train", "test"):
            d = tmp_path / split
            d.mkdir()
            for i in range(5):
                arr = (rng.random((70, 90, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.png")
        return str(tmp_path)

    def test_load_image(self, dataset_dir):
        path = os.path.join(dataset_dir, "train", "img_0.png")
        img = load_image(path)
        assert img.shape == (70, 90, 3)
        assert img.dtype == np.float32
        assert 0 <= img.min() and img.max() <= 1

    def test_train_batches(self, dataset_dir):
        ds = ImageFolder(dataset_dir, "train", patch_size=(64, 64))
        batches = list(ds.batches(batch_size=2, epoch=0))
        assert len(batches) == 2  # 5 images, drop_last
        for b in batches:
            assert b.shape == (2, 64, 64, 3)

    def test_shuffling_changes_across_epochs(self, dataset_dir):
        ds = ImageFolder(dataset_dir, "train", patch_size=(64, 64))
        b0 = np.concatenate(list(ds.batches(2, epoch=0)))
        b1 = np.concatenate(list(ds.batches(2, epoch=1)))
        assert not np.array_equal(b0, b1)

    def test_determinism_within_epoch(self, dataset_dir):
        ds = ImageFolder(dataset_dir, "train", patch_size=(64, 64))
        b0 = np.concatenate(list(ds.batches(2, epoch=3)))
        b1 = np.concatenate(list(ds.batches(2, epoch=3)))
        np.testing.assert_array_equal(b0, b1)

    def test_sharding_disjoint(self, dataset_dir):
        ds = ImageFolder(dataset_dir, "train", patch_size=(64, 64))
        # with 2 shards of 5 files -> 2 files each, different content
        s0 = list(ds.batches(1, epoch=0, shard=(0, 2)))
        s1 = list(ds.batches(1, epoch=0, shard=(1, 2)))
        assert len(s0) == len(s1) == 2

    def test_center_crop_eval(self, dataset_dir):
        ds = ImageFolder(dataset_dir, "test", patch_size=(64, 64))
        a = np.concatenate(list(ds.batches(1, epoch=0, drop_last=False)))
        b = np.concatenate(list(ds.batches(1, epoch=5, drop_last=False)))
        np.testing.assert_array_equal(a, b)  # no augmentation at eval
