"""Data layer: numpy-based datasets and batch loaders (host-side).

TPU-native pipeline: data stays in numpy on the host, batches are
assembled per-process (for multi-host, each process loads its shard) and
device_put with the right sharding happens in the trainer — there is no
framework-level "DataLoader over worker processes" because XLA wants
large, static, ready batches, not per-sample Python workers.

Capability parity:
  ref: base/base_data_loader.py:7-64   (validation_split via seeded
       shuffle + subset samplers; split_validation companion)
  ref: data_loader/data_loaders.py:9-89 (MNIST/CIFAR10/CIFAR100/ImageNet
       loaders, train/eval transforms, calibration subsampling
       n_samples/random_sample)
  ref: example/benchmark/benchmark.py:35-54 (synthetic dataset fixture)

Real datasets load from local files (CIFAR python/binary pickles, MNIST
idx, ImageNet folders via PIL); with no dataset on disk the synthetic
dataset provides a learnable class-structured fixture so E2E train/PTQ
tests run hermetically.
"""

from __future__ import annotations

import gzip
import pickle
import struct
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2470, 0.2435, 0.2616], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ArrayDataset:
    """In-memory dataset: images (N,H,W,C) uint8/float32 + labels (N,).

    Batch assembly (gather + pad-crop + flip + 1/255 + normalize) runs
    through the native C++ pipeline (data/native/augment.cpp, threaded,
    single fused pass) when it is available; the numpy path draws the
    same randomness in the same order, so both are bit-exact.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 mean=None, std=None, train_augment: bool = False,
                 pad: int = 4, use_native: Optional[bool] = None):
        assert len(images) == len(labels)
        self.images = images
        self.labels = np.asarray(labels, np.int32)
        self.mean = mean
        self.std = std
        self.train_augment = train_augment
        self.pad = pad
        self._scale255 = (images.dtype == np.uint8
                          or float(images[:16].max(initial=0.0)) > 2.0)
        if use_native is None:
            from dlmc_quant_tpu.data import native
            use_native = native.available()
        self.use_native = use_native

    def __len__(self):
        return len(self.images)

    def get_batch(self, idx: np.ndarray, rng: Optional[np.random.Generator]
                  ) -> Tuple[np.ndarray, np.ndarray]:
        aug = self.train_augment and rng is not None
        if aug:
            n = len(idx)
            oy = rng.integers(0, 2 * self.pad + 1, n)
            ox = rng.integers(0, 2 * self.pad + 1, n)
            flip = rng.random(n) < 0.5
        if self.use_native:
            from dlmc_quant_tpu.data import native
            x = native.augment_gather(
                self.images, idx,
                pad=self.pad if aug else 0,
                oy=oy if aug else None, ox=ox if aug else None,
                flip=flip if aug else None,
                mean=self.mean, std=self.std, scale255=self._scale255)
            return x, self.labels[idx]
        x = self.images[idx].astype(np.float32)
        if self._scale255:
            x = x / 255.0
        if aug:
            x = self._augment(x, oy, ox, flip)
        if self.mean is not None:
            x = (x - self.mean) / self.std
        return x, self.labels[idx]

    def _augment(self, x, oy, ox, flip):
        """Random crop (zero-pad) + horizontal flip — the reference's CIFAR
        train transform (ref: data_loaders.py:24-31)."""
        n, h, w, _ = x.shape
        p = self.pad
        xp = np.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        out = np.empty_like(x)
        for i in range(n):
            out[i] = xp[i, oy[i]:oy[i] + h, ox[i]:ox[i] + w]
        out[flip] = out[flip, :, ::-1]
        return out


class DataLoader:
    """Seeded, epoch-reshufflable batch iterator with validation split.

    ref: base/base_data_loader.py:7-64
    """

    def __init__(self, dataset: ArrayDataset, batch_size: int = 128,
                 shuffle: bool = True, validation_split: float = 0.0,
                 drop_last: bool = True, seed: int = 0,
                 indices: Optional[np.ndarray] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

        if indices is not None:
            self.indices = np.asarray(indices)
            self._val_indices = None
        else:
            n = len(dataset)
            all_idx = np.arange(n)
            if validation_split:
                n_val = (int(validation_split) if validation_split >= 1
                         else int(n * validation_split))
                rng = np.random.default_rng(0)   # deterministic split
                rng.shuffle(all_idx)
                self._val_indices = all_idx[:n_val]
                self.indices = all_idx[n_val:]
            else:
                self.indices = all_idx
                self._val_indices = None

    def split_validation(self) -> Optional["DataLoader"]:
        if self._val_indices is None:
            return None
        return DataLoader(self.dataset, self.batch_size, shuffle=False,
                          indices=self._val_indices, drop_last=False)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    @property
    def n_samples(self):
        return len(self.indices)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = self.indices.copy()
        rng = np.random.default_rng((self.seed, self._epoch))
        if self.shuffle:
            rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            batch_idx = idx[b * self.batch_size:(b + 1) * self.batch_size]
            yield self.dataset.get_batch(
                batch_idx, rng if self.dataset.train_augment else None)

    def shard(self, process_index: int, process_count: int) -> "DataLoader":
        """Per-host data sharding (replaces DistributedSampler,
        ref: DDP_RootQ_train.py:81-97)."""
        return DataLoader(self.dataset, self.batch_size, self.shuffle,
                          indices=self.indices[process_index::process_count],
                          drop_last=self.drop_last,
                          seed=self.seed + process_index)

    def prefetch(self, depth: int = 2) -> "PrefetchLoader":
        """Wrap with background-thread batch assembly (host augment
        overlaps device compute; the native C++ pass releases the GIL)."""
        return PrefetchLoader(self, depth)


class PrefetchLoader:
    """Background-thread prefetch over any batch iterable.

    Replaces the reference's DataLoader worker processes: one host thread
    assembles the next ``depth`` batches (the native pipeline holds the
    GIL only at call boundaries) while the device runs the current step.
    Proxies attributes of the wrapped loader (len, set_epoch, ...).
    """

    def __init__(self, loader: "DataLoader", depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __getattr__(self, name):
        return getattr(self.loader, name)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()

        def worker():
            try:
                for item in self.loader:
                    q.put(item)
                q.put(_END)
            except BaseException as e:  # surface errors in the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()


class ImageFolderDataset:
    """Streaming ImageFolder dataset: O(batch) memory.

    Holds only file paths + labels; ``get_batch`` decodes the requested
    images on a thread pool (PIL/libjpeg release the GIL during decode)
    and applies the transform per batch:

      train: RandomResizedCrop(size, scale=(0.08, 1)) + random hflip
             (ref: data_loader/data_loaders.py:66-70)
      eval:  Resize(size/0.875) + CenterCrop(size)
             (ref: data_loader/data_loaders.py:71-77)

    This replaces materializing the whole split in RAM (1.28M ImageNet
    train images ≈ 190 GB): steady-state memory is ``depth × batch``
    decoded images when wrapped in a PrefetchLoader.
    """

    def __init__(self, paths, labels, size: int = 224, mean=None, std=None,
                 train_augment: bool = False, num_workers: int = 8,
                 native_decode: Optional[bool] = None):
        self.paths = list(paths)
        self.labels = np.asarray(labels, np.int32)
        self.size = size
        self.mean = mean
        self.std = std
        self.train_augment = train_augment
        self.num_workers = max(int(num_workers), 1)
        if native_decode is None:
            from dlmc_quant_tpu.data import native
            native_decode = native.jpeg_available()
        self.native_decode = bool(native_decode)
        self._pool = None

    def __len__(self):
        return len(self.paths)

    # pickling (e.g. for copies): drop the live pool
    def __getstate__(self):
        d = dict(self.__dict__)
        d["_pool"] = None
        return d

    def _ensure_pool(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="imgdecode")
        return self._pool

    # -- transforms ------------------------------------------------------

    def _rrc_params(self, w, h, rng):
        """RandomResizedCrop sampling: area scale U(0.08, 1), log-uniform
        aspect in (3/4, 4/3), 10 attempts then center fallback — the
        torchvision semantics the reference's train transform uses."""
        area = w * h
        for _ in range(10):
            target = area * rng.uniform(0.08, 1.0)
            aspect = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(target * aspect)))
            ch = int(round(np.sqrt(target / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = int(rng.integers(0, w - cw + 1))
                top = int(rng.integers(0, h - ch + 1))
                return left, top, cw, ch
        # fallback: largest center crop within aspect bounds
        in_ratio = w / h
        if in_ratio < 3 / 4:
            cw, ch = w, min(int(round(w / (3 / 4))), h)
        elif in_ratio > 4 / 3:
            cw, ch = min(int(round(h * (4 / 3))), w), h
        else:
            cw, ch = w, h
        return (w - cw) // 2, (h - ch) // 2, cw, ch

    def _decode_train(self, path, left, top, cw, ch, flip,
                      data: Optional[bytes] = None):
        if data is not None:
            from dlmc_quant_tpu.data import native
            out = native.jpeg_decode_resize(
                data, (left, top, cw, ch), (self.size, self.size), flip)
            if out is not None:
                return out
        from PIL import Image
        im = Image.open(path).convert("RGB")
        im = im.resize((self.size, self.size), Image.BILINEAR,
                       box=(left, top, left + cw, top + ch))
        a = np.asarray(im, np.uint8)
        return a[:, ::-1] if flip else a

    def _decode_eval(self, path):
        size = self.size
        resize = int(size / 0.875)
        from dlmc_quant_tpu.data import native
        if self.native_decode and native.jpeg_available():
            # resize-shorter-side-then-center-crop expressed as one
            # fused crop+resize: crop box of side min(w,h)*size/resize,
            # centered, resized to (size, size)
            try:
                data = Path(path).read_bytes()
            except OSError:
                data = None
            dims = native.jpeg_dims(data) if data else None
            if dims is not None:
                w, h = dims
                side = round(min(w, h) * size / resize)
                left, top = (w - side) // 2, (h - side) // 2
                out = native.jpeg_decode_resize(
                    data, (left, top, side, side), (size, size))
                if out is not None:
                    return out
        from PIL import Image
        im = Image.open(path).convert("RGB")
        w, h = im.size
        scale = resize / min(w, h)
        im = im.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
        w, h = im.size
        left, top = (w - size) // 2, (h - size) // 2
        im = im.crop((left, top, left + size, top + size))
        return np.asarray(im, np.uint8)

    # -- batch API (same protocol as ArrayDataset) ------------------------

    def get_batch(self, idx: np.ndarray,
                  rng: Optional[np.random.Generator]):
        pool = self._ensure_pool()
        aug = self.train_augment and rng is not None
        if aug:
            # geometry params need image sizes — probe the header INSIDE
            # the worker (PIL reads only the header; serially on the
            # dispatcher thread it throttled the whole pipeline).  Each
            # image gets its own spawned child generator so the sampled
            # geometry is deterministic regardless of worker completion
            # order.
            child_rngs = rng.spawn(len(idx))

            def job(i, r):
                from dlmc_quant_tpu.data import native
                p = self.paths[i]
                data = dims = None
                if self.native_decode and native.jpeg_available():
                    try:
                        data = Path(p).read_bytes()
                        dims = native.jpeg_dims(data)
                    except OSError:
                        data = None
                if dims is not None:
                    w, h = dims
                else:
                    from PIL import Image
                    with Image.open(p) as im:
                        w, h = im.size
                    data = None
                left, top, cw, ch = self._rrc_params(w, h, r)
                flip = bool(r.random() < 0.5)
                return self._decode_train(p, left, top, cw, ch, flip,
                                          data=data)

            imgs = list(pool.map(job, idx, child_rngs))
        else:
            imgs = list(pool.map(self._decode_eval,
                                 [self.paths[i] for i in idx]))
        from dlmc_quant_tpu.data import native
        if native.available():
            # fused threaded u8→f32 + normalize (augment.cpp): the
            # single-threaded numpy stack+normalize tail measured
            # ~230 ms per 128×224² batch — a ~560 img/s ceiling all by
            # itself — so it runs through the native pass instead
            batch = np.stack(imgs)
            x = native.augment_gather(batch,
                                      np.arange(len(imgs), dtype=np.int64),
                                      mean=self.mean, std=self.std,
                                      scale255=True)
            return x, self.labels[idx]
        x = np.stack(imgs).astype(np.float32) / 255.0
        if self.mean is not None:
            x = (x - self.mean) / self.std
        return x, self.labels[idx]


def scan_image_folder(split_dir: Path):
    """ImageFolder layout scan → (paths, labels, classes)."""
    classes = sorted(p.name for p in split_dir.iterdir() if p.is_dir())
    cls_idx = {c: i for i, c in enumerate(classes)}
    paths, labels = [], []
    for c in classes:
        for p in sorted((split_dir / c).iterdir()):
            paths.append(p)
            labels.append(cls_idx[c])
    return paths, np.asarray(labels), classes


# ---------------------------------------------------------------------------
# dataset readers
# ---------------------------------------------------------------------------

def _load_cifar_python(data_dir: Path, train: bool, n_classes: int):
    """CIFAR-10/100 python-pickle format."""
    if n_classes == 10:
        files = ([f"data_batch_{i}" for i in range(1, 6)] if train
                 else ["test_batch"])
        root = data_dir / "cifar-10-batches-py"
        label_key = b"labels"
    else:
        files = ["train"] if train else ["test"]
        root = data_dir / "cifar-100-python"
        label_key = b"fine_labels"
    xs, ys = [], []
    for fn in files:
        with open(root / fn, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        ys.extend(d[label_key])
    return np.concatenate(xs), np.asarray(ys)


def _synthetic_classification(n: int, image_size, num_classes: int,
                              seed: int = 0, profile: str = "easy",
                              split: str = "train"):
    """Learnable synthetic data: per-class mean patterns + noise.

    A hermetic stand-in when no dataset exists on disk (zero-egress
    environments); models can actually fit it, so train/PTQ accuracy
    pipelines are exercisable end-to-end.

    Profiles:
      * ``'easy'`` — full-image iid prototypes, low noise.  Any sane
        model saturates (fp32 ≈ 99.9%): good for E2E smoke tests, but
        useless for discriminating quantization deltas.
      * ``'hard'`` — class signal confined to a low-rank subspace
        (class prototype = mix of a few shared basis patterns) under
        much stronger pixel noise, so fp32 tops out well below 100%
        and a ±0.5% accuracy criterion has room to discriminate.  Used
        by tools/accuracy_protocol.py.
    """
    h, w, c = image_size
    rng = np.random.default_rng(seed)          # prototypes: split-shared
    # labels/noise come from a split-specific stream — with a single
    # stream the eval set's first draws coincide with the train set's
    # (same seed, same order), i.e. eval ⊂ train.
    srng = np.random.default_rng((seed, 0 if split == "train" else 1))
    labels = srng.integers(0, num_classes, n)
    if profile == "hard":
        # shared LOW-FREQUENCY basis (generated at base-res, nearest-
        # upsampled): classes differ only through k-dim mixing
        # coefficients, so pairwise prototype distances are small and
        # graded, and the smooth patterns survive the train transform's
        # pad-crop shifts; strong iid noise pushes the decision
        # boundaries near the network's reach instead of far from it.
        # tuned on cifar_resnet20 at the protocol's 30-epoch schedule
        # (tools/tune_hard_task.py): the 30-epoch asymptote is set by
        # the noise, not amp — (1.5, σ=0.30) → 96.7%, (1.5, σ=0.40) →
        # 90.45% fp32.  σ=0.40 lands mid-band.
        k, amp, sigma, base = 16, 1.5, 0.40, 8
        lo = rng.normal(0.0, 1.0, (k, base, base, c)).astype(np.float32)
        basis = lo[:, (np.arange(h) * base) // h][
            :, :, (np.arange(w) * base) // w]
        basis /= np.linalg.norm(basis.reshape(k, -1), axis=1).reshape(
            k, 1, 1, 1)
        coef = rng.normal(0.0, 1.0, (num_classes, k)).astype(np.float32)
        protos = 0.5 + amp * np.einsum("mk,khwc->mhwc", coef, basis)
        images = protos[labels] + srng.normal(0, sigma, (n, h, w, c))
    else:
        protos = rng.normal(0.5, 0.25,
                            (num_classes, h, w, c)).astype(np.float32)
        images = protos[labels] + srng.normal(0, 0.25, (n, h, w, c))
    return np.clip(images, 0, 1).astype(np.float32), labels


def _subsample(images, labels, n_samples: Optional[int],
               random_sample: bool, seed: int = 0):
    """Calibration subsampling (ref: data_loaders.py:61-89)."""
    if not n_samples or n_samples >= len(images):
        return images, labels
    if random_sample:
        idx = np.random.default_rng(seed).choice(len(images), n_samples,
                                                 replace=False)
    else:
        idx = np.arange(n_samples)
    return images[idx], labels[idx]


# ---------------------------------------------------------------------------
# loader factories (the YAML-facing API; ref: data_loader/data_loaders.py)
# ---------------------------------------------------------------------------

def CIFAR10(data_dir: str = "data", batch_size: int = 128,
            shuffle: bool = True, validation_split: float = 0.0,
            training: bool = True, n_samples: Optional[int] = None,
            random_sample: bool = False, num_workers: int = 0,
            synthetic_fallback: bool = True, seed: int = 0,
            synthetic_profile: str = "easy",
            _n_classes: int = 10) -> DataLoader:
    root = Path(data_dir)
    try:
        images, labels = _load_cifar_python(root, training, _n_classes)
    except (FileNotFoundError, OSError):
        if not synthetic_fallback:
            raise
        images, labels = _synthetic_classification(
            10000 if training else 2000, (32, 32, 3), _n_classes, seed,
            profile=synthetic_profile,
            split="train" if training else "eval")
    images, labels = _subsample(images, labels, n_samples, random_sample,
                                seed)
    ds = ArrayDataset(images, labels, CIFAR_MEAN, CIFAR_STD,
                      train_augment=training)
    return DataLoader(ds, batch_size, shuffle and training,
                      validation_split, drop_last=training, seed=seed)


def CIFAR100(**kw) -> DataLoader:
    return CIFAR10(_n_classes=100, **kw)


def Mnist(data_dir: str = "data", batch_size: int = 128,
          shuffle: bool = True, validation_split: float = 0.0,
          training: bool = True, synthetic_fallback: bool = True,
          num_workers: int = 0, seed: int = 0) -> DataLoader:
    root = Path(data_dir) / "MNIST" / "raw"
    prefix = "train" if training else "t10k"
    try:
        def read_idx(path):
            op = gzip.open if str(path).endswith(".gz") else open
            with op(path, "rb") as f:
                magic, = struct.unpack(">I", f.read(4))
                dims = [struct.unpack(">I", f.read(4))[0]
                        for _ in range(magic & 0xFF)]
                return np.frombuffer(f.read(), np.uint8).reshape(dims)

        def find(stem):
            for suffix in ("", ".gz"):
                p = root / (stem + suffix)
                if p.exists():
                    return p
            raise FileNotFoundError(stem)

        images = read_idx(find(f"{prefix}-images-idx3-ubyte"))[..., None]
        labels = read_idx(find(f"{prefix}-labels-idx1-ubyte"))
    except (FileNotFoundError, OSError):
        if not synthetic_fallback:
            raise
        images, labels = _synthetic_classification(
            6000 if training else 1000, (28, 28, 1), 10, seed,
            split="train" if training else "eval")
    ds = ArrayDataset(images, labels,
                      np.float32(0.1307), np.float32(0.3081))
    return DataLoader(ds, batch_size, shuffle and training,
                      validation_split, drop_last=training, seed=seed)


def ImageNet(data_dir: str, batch_size: int = 64, shuffle: bool = True,
             training: bool = True, size: int = 224,
             n_samples: Optional[int] = None, random_sample: bool = False,
             validation_split: float = 0.0, num_workers: int = 8,
             synthetic_fallback: bool = True, seed: int = 0,
             prefetch_depth: int = 2,
             native_decode: Optional[bool] = None) -> DataLoader:
    """Streaming ImageFolder loader: per-batch JPEG decode on worker
    threads, RandomResizedCrop+flip train transform / Resize+CenterCrop
    eval transform, O(batch) memory — never materializes the split
    (1.28M train images would be ~190 GB).  ref: data_loaders.py:61-89.
    """
    split_dir = Path(data_dir) / ("train" if training else "val")
    if split_dir.is_dir():
        paths, labels, _ = scan_image_folder(split_dir)
        paths = np.array(paths, dtype=object)
        if n_samples:
            idx = (np.random.default_rng(seed).choice(
                len(paths), n_samples, replace=False)
                if random_sample else np.arange(n_samples))
            paths, labels = paths[idx], labels[idx]
        ds = ImageFolderDataset(paths, labels, size,
                                IMAGENET_MEAN, IMAGENET_STD,
                                train_augment=training,
                                num_workers=num_workers or 8,
                                native_decode=native_decode)
    else:
        if not synthetic_fallback:
            raise FileNotFoundError(split_dir)
        images, labels = _synthetic_classification(
            n_samples or (2048 if training else 1024), (size, size, 3),
            1000, seed, split="train" if training else "eval")
        ds = ArrayDataset(images, labels, IMAGENET_MEAN, IMAGENET_STD,
                          train_augment=training)
    loader = DataLoader(ds, batch_size, shuffle and training,
                        validation_split, drop_last=training, seed=seed)
    if isinstance(ds, ImageFolderDataset) and prefetch_depth:
        return loader.prefetch(prefetch_depth)
    return loader


def Synthetic(batch_size: int = 64, image_size: int = 224,
              num_classes: int = 1000, length: int = 1281167,
              materialized: int = 4096, training: bool = True,
              seed: int = 0, **_kw) -> DataLoader:
    """Random-image benchmark dataset (ref: benchmark.py:35-54 _MyDataset);
    ``length`` is the virtual epoch length, ``materialized`` the number of
    distinct samples actually held in memory.
    """
    images, labels = _synthetic_classification(
        min(materialized, length), (image_size, image_size, 3), num_classes,
        seed)
    ds = ArrayDataset(images, labels, IMAGENET_MEAN, IMAGENET_STD)
    return DataLoader(ds, batch_size, shuffle=training, seed=seed)


DATALOADERS = {
    "Mnist": Mnist,
    "CIFAR10": CIFAR10,
    "CIFAR100": CIFAR100,
    "ImageNet": ImageNet,
    "Synthetic": Synthetic,
}


def get_dataloader(name: str, **kwargs) -> DataLoader:
    try:
        return DATALOADERS[name](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown dataloader {name!r}; known: "
            f"{sorted(DATALOADERS)}") from None
