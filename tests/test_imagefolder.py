"""Streaming ImageFolder pipeline tests (ImageNet-scale data layer).

The loader must decode per-batch on worker threads with O(batch) memory
(ref: data_loader/data_loaders.py:61-89 DataLoader-worker semantics) —
never materializing the split.
"""

import numpy as np
import pytest

from dlmc_quant_tpu.data.loaders import (
    DataLoader, ImageFolderDataset, ImageNet, PrefetchLoader,
    scan_image_folder,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    """Tiny ImageFolder tree: 2 classes x 6 JPEGs, varied sizes."""
    root = tmp_path_factory.mktemp("imagenet")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for ci, cls in enumerate(["n01", "n02"]):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(6):
                h, w = int(rng.integers(40, 90)), int(rng.integers(40, 90))
                arr = rng.integers(0, 255, (h, w, 3), np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return root


def test_scan_image_folder(folder):
    paths, labels, classes = scan_image_folder(folder / "train")
    assert classes == ["n01", "n02"]
    assert len(paths) == 12 and set(labels) == {0, 1}


def test_streaming_no_materialization(folder):
    loader = ImageNet(str(folder), batch_size=4, training=True, size=32,
                      synthetic_fallback=False, prefetch_depth=0)
    ds = loader.dataset
    assert isinstance(ds, ImageFolderDataset)
    assert not hasattr(ds, "images")          # O(batch): paths only
    batches = list(loader)
    assert len(batches) == 3                   # 12 imgs / bs 4, drop_last
    for x, y in batches:
        assert x.shape == (4, 32, 32, 3) and x.dtype == np.float32
        assert y.shape == (4,)
        assert np.isfinite(x).all()


def test_train_transform_randomized_but_seeded(folder):
    def batches(seed):
        loader = ImageNet(str(folder), batch_size=4, training=True,
                          size=32, synthetic_fallback=False, seed=seed,
                          prefetch_depth=0)
        loader.set_epoch(1)
        return [x for x, _ in loader]

    a, b, c = batches(0), batches(0), batches(1)
    for xa, xb in zip(a, b):                   # same seed → identical
        np.testing.assert_array_equal(xa, xb)
    assert any(not np.array_equal(xa, xc) for xa, xc in zip(a, c))

    # augmentation varies across epochs
    loader = ImageNet(str(folder), batch_size=4, training=True, size=32,
                      synthetic_fallback=False, prefetch_depth=0)
    loader.set_epoch(1)
    e1 = [x for x, _ in loader]
    loader.set_epoch(2)
    e2 = [x for x, _ in loader]
    assert any(not np.array_equal(x1, x2) for x1, x2 in zip(e1, e2))


def test_eval_transform_matches_reference_semantics(folder):
    """Eval path = Resize(size/0.875) + CenterCrop(size), bit-exact vs a
    hand-rolled PIL computation (ref: data_loaders.py:71-77)."""
    size = 32
    loader = ImageNet(str(folder), batch_size=4, training=False, size=size,
                      native_decode=False,
                      synthetic_fallback=False, shuffle=False,
                      prefetch_depth=0)
    paths, labels, _ = scan_image_folder(folder / "val")
    x, y = next(iter(loader))

    im = Image.open(paths[0]).convert("RGB")
    w, h = im.size
    scale = int(size / 0.875) / min(w, h)
    im = im.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
    w, h = im.size
    left, top = (w - size) // 2, (h - size) // 2
    ref = np.asarray(im.crop((left, top, left + size, top + size)),
                     np.uint8).astype(np.float32) / 255.0
    from dlmc_quant_tpu.data.loaders import IMAGENET_MEAN, IMAGENET_STD
    ref = (ref - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(x[0], ref, atol=1e-6)
    assert y[0] == labels[0]


def test_prefetch_wraps_streaming(folder):
    loader = ImageNet(str(folder), batch_size=4, training=True, size=32,
                      synthetic_fallback=False)   # default prefetch
    assert isinstance(loader, PrefetchLoader)
    xs = [x for x, _ in loader]
    assert len(xs) == 3 and xs[0].shape == (4, 32, 32, 3)


def test_shard_and_subsample(folder):
    loader = ImageNet(str(folder), batch_size=2, training=True, size=32,
                      synthetic_fallback=False, n_samples=8,
                      prefetch_depth=0)
    assert loader.n_samples == 8
    s0 = loader.shard(0, 2)
    s1 = loader.shard(1, 2)
    assert s0.n_samples + s1.n_samples == 8
    assert isinstance(s0, DataLoader)
    x, _ = next(iter(s0))
    assert x.shape == (2, 32, 32, 3)
