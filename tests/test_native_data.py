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
