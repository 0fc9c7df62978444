"""Image-folder data pipeline.

Reference layout (`compressai/datasets/utils.py:21-66`): root/{train,test}/
containing images. This loader adds what the reference got from torch's
DataLoader: multi-threaded decode, shuffling, fixed-size random crops /
center crops, horizontal flips, batching, and device prefetch (double
buffering host->HBM transfers against TPU compute).
"""

import os
import threading
import queue as queue_mod
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".webp"}


def load_image(path: str) -> np.ndarray:
    """Decode an image file to float32 NHW3 in [0,1] (no batch dim)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def list_images(root: str) -> list:
    files = sorted(
        os.path.join(root, f)
        for f in os.listdir(root)
        if os.path.splitext(f)[1].lower() in _IMG_EXTS
    )
    if not files:
        raise RuntimeError(f"no images found in {root!r}")
    return files


class ImageFolder:
    """Iterable dataset of fixed-size crops with background decoding.

    Args:
        root: directory containing a `split` subdirectory of images.
        split: "train" or "test".
        patch_size: (h, w) crop size.
        train: random crop + random horizontal flip when True, center crop
            otherwise.
    """

    def __init__(
        self,
        root: str,
        split: str = "train",
        patch_size: Tuple[int, int] = (256, 256),
        train: Optional[bool] = None,
        seed: int = 0,
    ):
        self.dir = os.path.join(root, split)
        if not os.path.isdir(self.dir):
            raise RuntimeError(f'Invalid directory "{self.dir}"')
        self.files = list_images(self.dir)
        self.patch_size = tuple(patch_size)
        self.train = train if train is not None else split == "train"
        self.seed = seed

    def __len__(self):
        return len(self.files)

    def _load_patch(self, path: str, rng: np.random.Generator) -> np.ndarray:
        img = load_image(path)
        ph, pw = self.patch_size
        h, w = img.shape[:2]
        # zero-pad if the image is smaller than the patch (the reference's
        # RandomCrop(pad_if_needed=True) semantics; reflect would fail when
        # the pad exceeds the image size)
        if h < ph or w < pw:
            img = np.pad(
                img, ((0, max(0, ph - h)), (0, max(0, pw - w)), (0, 0))
            )
            h, w = img.shape[:2]
        if self.train:
            top = int(rng.integers(0, h - ph + 1))
            left = int(rng.integers(0, w - pw + 1))
        else:
            top, left = (h - ph) // 2, (w - pw) // 2
        patch = img[top : top + ph, left : left + pw]
        if self.train and rng.random() < 0.5:
            patch = patch[:, ::-1]
        return np.ascontiguousarray(patch)

    def batches(
        self,
        batch_size: int,
        epoch: int = 0,
        num_workers: int = 8,
        drop_last: bool = True,
        shard: Tuple[int, int] = (0, 1),
    ) -> Iterator[np.ndarray]:
        """Yield NHWC float32 batches. `shard=(index, count)` gives each data
        parallel host a disjoint, equally-sized file subset (the reference's
        DistributedSampler semantics, `train.py:324`)."""
        rng = np.random.default_rng((self.seed, epoch))
        order = np.arange(len(self.files))
        if self.train:
            rng.shuffle(order)
        idx, count = shard
        per = len(order) // count if count > 1 else len(order)
        if count > 1:
            order = order[idx * per : (idx + 1) * per]

        item_rngs = [
            np.random.default_rng((self.seed, epoch, int(i))) for i in order
        ]
        # Bounded in-flight window: decoded patches are O(window) in memory
        # regardless of dataset size (submitting every file up front would
        # hold tens of GB of decoded crops on a 300k-image training set).
        window = max(2 * num_workers, batch_size)
        items = iter(zip(order, item_rngs))
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            pending: deque = deque()
            for i, r in items:
                pending.append(pool.submit(self._load_patch, self.files[i], r))
                if len(pending) >= window:
                    break
            batch = []
            while pending:
                batch.append(pending.popleft().result())
                nxt = next(items, None)
                if nxt is not None:
                    i, r = nxt
                    pending.append(
                        pool.submit(self._load_patch, self.files[i], r)
                    )
                if len(batch) == batch_size:
                    yield np.stack(batch)
                    batch = []
            if batch and not drop_last:
                yield np.stack(batch)


def prefetch_to_device(iterator, size: int = 2, sharding=None, put=None):
    """Double-buffer host batches onto the device, overlapping H2D transfer
    with device compute.

    `put` is an optional transfer callable (e.g. wrapping
    `jax.make_array_from_process_local_data` for multi-host); when absent,
    batches go through `jax.device_put` (with `sharding` if given).
    """
    import jax

    if put is None:
        def put(batch):
            if sharding is not None:
                return jax.device_put(batch, sharding)
            return jax.device_put(batch)

    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
            q.put(_END)
        except BaseException as e:  # surface loader errors in the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
