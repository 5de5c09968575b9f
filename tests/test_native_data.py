"""Native C++ data pipeline: parity with the numpy path and prefetch."""

import numpy as np
import pytest

from dlmc_quant_tpu.data import native
from dlmc_quant_tpu.data.loaders import (
    ArrayDataset, DataLoader, PrefetchLoader, CIFAR_MEAN, CIFAR_STD)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native pipeline")


def _mk(n=64, h=32, w=32, c=3, dtype=np.uint8, seed=0):
    rng = np.random.default_rng(seed)
    if dtype == np.uint8:
        imgs = rng.integers(0, 256, (n, h, w, c), np.uint8)
    else:
        imgs = rng.random((n, h, w, c), np.float32)
    labels = rng.integers(0, 10, n)
    return imgs, labels


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
@pytest.mark.parametrize("augment", [False, True])
def test_native_matches_numpy(dtype, augment):
    imgs, labels = _mk(dtype=dtype)
    kw = dict(mean=CIFAR_MEAN, std=CIFAR_STD, train_augment=augment)
    ds_nat = ArrayDataset(imgs, labels, use_native=True, **kw)
    ds_np = ArrayDataset(imgs, labels, use_native=False, **kw)
    idx = np.arange(48)
    x1, y1 = ds_nat.get_batch(idx, np.random.default_rng(7))
    x2, y2 = ds_np.get_batch(idx, np.random.default_rng(7))
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_allclose(x1, x2, rtol=1e-5, atol=1e-5)


def test_native_no_normalize_no_aug():
    imgs, labels = _mk(dtype=np.uint8)
    ds = ArrayDataset(imgs, labels, use_native=True)
    x, _ = ds.get_batch(np.arange(8), None)
    np.testing.assert_allclose(
        x, imgs[:8].astype(np.float32) / 255.0, rtol=1e-6)


def test_native_crop_borders_zero():
    """Max crop offset pulls in the zero padding at the border."""
    imgs, labels = _mk(n=4)
    ds = ArrayDataset(imgs, labels, use_native=True, train_augment=True,
                      pad=4)
    x = native.augment_gather(
        imgs, np.arange(4), pad=4,
        oy=np.zeros(4, np.int32), ox=np.zeros(4, np.int32),
        flip=np.zeros(4, np.uint8), scale255=True)
    # offset 0 => top-left 4 rows/cols come from the zero pad
    assert np.all(x[:, :4, :, :] == 0)
    assert np.all(x[:, :, :4, :] == 0)
    # interior shifted: x[4,4] == original [0,0]
    np.testing.assert_allclose(
        x[:, 4:, 4:, :], imgs[:, :-4, :-4, :].astype(np.float32) / 255.0,
        rtol=1e-6)


def test_native_flip():
    imgs, labels = _mk(n=4)
    x = native.augment_gather(
        imgs, np.arange(4), flip=np.ones(4, np.uint8), scale255=True)
    np.testing.assert_allclose(
        x, imgs[:, :, ::-1, :].astype(np.float32) / 255.0, rtol=1e-6)


def test_native_gather_indices():
    imgs, labels = _mk(n=16)
    idx = np.array([3, 3, 0, 15], np.int64)
    x = native.augment_gather(imgs, idx, scale255=True)
    np.testing.assert_allclose(
        x, imgs[idx].astype(np.float32) / 255.0, rtol=1e-6)


def test_prefetch_loader_same_batches():
    imgs, labels = _mk(n=100)
    ds = ArrayDataset(imgs, labels, train_augment=True, use_native=False)
    dl = DataLoader(ds, batch_size=32, shuffle=True, seed=3)
    plain = [(x.copy(), y.copy()) for x, y in dl]
    pre = list(dl.prefetch(depth=2))
    assert isinstance(dl.prefetch(), PrefetchLoader)
    assert len(plain) == len(pre)
    for (x1, y1), (x2, y2) in zip(plain, pre):
        np.testing.assert_array_equal(y1, y2)
        np.testing.assert_allclose(x1, x2)


class TestNativeJpegDecode:
    """Native libjpeg decode stage (data/native/jpegdec.cpp)."""

    @staticmethod
    def _jpeg_bytes(img):
        import io

        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=95)
        return buf.getvalue()

    @staticmethod
    def _smooth(seed=0, size=256):
        rng = np.random.default_rng(seed)
        base = rng.normal(128, 40, (8, 8, 3)).clip(0, 255)
        return np.kron(base, np.ones((size // 8, size // 8, 1)))[
            :size, :size].astype(np.uint8)

    def test_dims_and_full_resize_close_to_pil(self):
        import io

        from PIL import Image

        from dlmc_quant_tpu.data import native
        if not native.jpeg_available():
            pytest.skip("libjpeg not available")
        data = self._jpeg_bytes(self._smooth())
        assert native.jpeg_dims(data) == (256, 256)
        out = native.jpeg_decode_resize(data, None, (224, 224))
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")
                         .resize((224, 224), Image.BILINEAR))
        assert out.shape == (224, 224, 3)
        assert np.abs(out.astype(int) - pil.astype(int)).mean() < 2.0

    def test_crop_flip_close_to_pil(self):
        import io

        from PIL import Image

        from dlmc_quant_tpu.data import native
        if not native.jpeg_available():
            pytest.skip("libjpeg not available")
        data = self._jpeg_bytes(self._smooth(seed=1))
        out = native.jpeg_decode_resize(data, (32, 16, 128, 128),
                                        (112, 112), flip=True)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")
                         .resize((112, 112), Image.BILINEAR,
                                 box=(32, 16, 160, 144)))[:, ::-1]
        assert np.abs(out.astype(int) - pil.astype(int)).mean() < 2.0

    def test_invalid_data_returns_none(self):
        from dlmc_quant_tpu.data import native
        if not native.jpeg_available():
            pytest.skip("libjpeg not available")
        assert native.jpeg_decode_resize(b"not a jpeg", None,
                                         (32, 32)) is None
        assert native.jpeg_dims(b"junk") is None
