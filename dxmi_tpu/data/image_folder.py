"""Image-folder dataset for ImageNet64 / LSUN.

Capability parity with /root/reference/models/cm/image_datasets.py:70-123
(recursive listing, center/random crop, horizontal flip, class-from-
filename-prefix, /127.5 - 1 normalisation) and
models/cm/dxmi_util.py:41-80 (file-list cache + infinite loader).
"""
from __future__ import annotations

import os
import pickle
from typing import Iterator, List, Optional, Tuple

import numpy as np

IMG_EXTS = {"jpg", "jpeg", "png", "gif", "webp", "bmp"}


def list_image_files_recursively(data_dir: str) -> List[str]:
    results = []
    for entry in sorted(os.listdir(data_dir)):
        full = os.path.join(data_dir, entry)
        ext = entry.split(".")[-1].lower()
        if "." in entry and ext in IMG_EXTS:
            results.append(full)
        elif os.path.isdir(full):
            results.extend(list_image_files_recursively(full))
    return results


def center_crop_arr(img, image_size: int) -> np.ndarray:
    """Downsample by powers of 2 then bicubic to the target scale, then
    center crop (image_datasets.py:126-145 semantics)."""
    from PIL import Image

    while min(*img.size) >= 2 * image_size:
        img = img.resize(tuple(x // 2 for x in img.size), resample=Image.BOX)
    scale = image_size / min(*img.size)
    img = img.resize(tuple(round(x * scale) for x in img.size),
                     resample=Image.BICUBIC)
    arr = np.array(img.convert("RGB"))
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    return arr[crop_y:crop_y + image_size, crop_x:crop_x + image_size]


def random_crop_arr(img, image_size: int, rng: np.random.RandomState,
                    min_frac=0.8, max_frac=1.0) -> np.ndarray:
    from PIL import Image

    min_s = round(image_size / max_frac)
    max_s = round(image_size / min_frac)
    smaller = rng.randint(min_s, max_s + 1)
    while min(*img.size) >= 2 * smaller:
        img = img.resize(tuple(x // 2 for x in img.size), resample=Image.BOX)
    scale = smaller / min(*img.size)
    img = img.resize(tuple(round(x * scale) for x in img.size),
                     resample=Image.BICUBIC)
    arr = np.array(img.convert("RGB"))
    crop_y = rng.randint(arr.shape[0] - image_size + 1)
    crop_x = rng.randint(arr.shape[1] - image_size + 1)
    return arr[crop_y:crop_y + image_size, crop_x:crop_x + image_size]


class ImageFolderDataset:
    """Lazy-decoding image dataset; classes from filename prefixes
    (``class_label.png`` convention, image_datasets.py:54-58)."""

    def __init__(self, data_dir: str, image_size: int, class_cond: bool = False,
                 cachefile: Optional[str] = None, random_crop: bool = False,
                 random_flip: bool = True):
        self.image_size = image_size
        self.random_crop = random_crop
        self.random_flip = random_flip

        if cachefile and os.path.exists(cachefile):
            with open(cachefile, "rb") as f:
                d = pickle.load(f)
            self.files, self.classes = d["files"], d["classes"]
        else:
            self.files = list_image_files_recursively(data_dir)
            self.classes = None
            if class_cond:
                names = [os.path.basename(p).split("_")[0] for p in self.files]
                sorted_classes = {c: i for i, c in enumerate(sorted(set(names)))}
                self.classes = np.asarray([sorted_classes[n] for n in names],
                                          dtype=np.int32)
            if cachefile:
                with open(cachefile, "wb") as f:
                    pickle.dump({"files": self.files, "classes": self.classes}, f)

    def __len__(self):
        return len(self.files)

    def load(self, idx: int, rng: np.random.RandomState
             ) -> Tuple[np.ndarray, Optional[int]]:
        from PIL import Image

        with open(self.files[idx], "rb") as f:
            img = Image.open(f)
            img.load()
        if self.random_crop:
            arr = random_crop_arr(img, self.image_size, rng)
        else:
            arr = center_crop_arr(img, self.image_size)
        if self.random_flip and rng.rand() < 0.5:
            arr = arr[:, ::-1]
        x = arr.astype(np.float32) / 127.5 - 1.0  # NHWC in [-1, 1]
        y = int(self.classes[idx]) if self.classes is not None else None
        return x, y


def load_data(data_dir: str, batch_size: int, image_size: int,
              class_cond: bool = False, cachefile: Optional[str] = None,
              deterministic: bool = False, random_crop: bool = False,
              random_flip: bool = True, seed: int = 0,
              process_index: int = 0, process_count: int = 1,
              num_workers: int = 0, prefetch: int = 2
              ) -> Iterator[Tuple[np.ndarray, dict]]:
    """Infinite, process-sharded batch generator (dxmi_util.load_data +
    infinite_loader equivalents). Yields (x (B,H,W,C) in [-1,1], {'y': ...}).

    ``num_workers > 0`` decodes images on a thread pool and assembles
    batches ahead of the consumer (``prefetch`` deep) — the TPU-side
    replacement for the reference's DataLoader worker processes
    (train_image_large.py:178-204): PIL releases the GIL during file
    reads/decode, so threads overlap input with device compute. Each
    image then gets its own SeedSequence-derived RNG (seed, epoch,
    index), making augmentation deterministic regardless of worker
    timing — the ``num_workers=0`` path keeps the original sequential
    RNG stream."""
    ds = ImageFolderDataset(data_dir, image_size, class_cond, cachefile,
                            random_crop, random_flip)
    rng = np.random.RandomState(seed + process_index)
    n = len(ds)

    def index_batches():
        epoch = 0
        while True:
            order = (np.arange(n) if deterministic else rng.permutation(n))
            shard = order[process_index::process_count]
            for i in range(0, len(shard) - batch_size + 1, batch_size):
                yield epoch, shard[i:i + batch_size]
            epoch += 1

    def pack(xs, ys):
        extra = {}
        if class_cond:
            extra["y"] = np.asarray(ys, dtype=np.int32)
        return np.stack(xs), extra

    if num_workers <= 0:
        for _, idx in index_batches():
            xs, ys = [], []
            for j in idx:
                x, y = ds.load(int(j), rng)
                xs.append(x)
                ys.append(y)
            yield pack(xs, ys)
        return

    import queue as queuelib
    import threading
    from concurrent.futures import ThreadPoolExecutor

    def load_one(epoch, j):
        r = np.random.RandomState(np.random.SeedSequence(
            [seed + process_index, epoch, int(j)]).generate_state(1)[0])
        return ds.load(int(j), r)

    q: "queuelib.Queue" = queuelib.Queue(maxsize=max(1, prefetch))
    pool = ThreadPoolExecutor(max_workers=num_workers)
    stop = threading.Event()

    def producer():
        try:
            for epoch, idx in index_batches():
                rows = list(pool.map(lambda j: load_one(epoch, j), idx))
                batch = pack([x for x, _ in rows], [y for _, y in rows])
                while not stop.is_set():  # bounded put that honors shutdown
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queuelib.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface decode errors to the consumer
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # generator closed/abandoned: unblock and reap the producer + pool
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queuelib.Empty:
            pass
        thread.join(timeout=5.0)
        pool.shutdown(wait=False, cancel_futures=True)
