"""Image-folder dataset (pre-cut patch folders).

Parity: the vanilla timm path (timm_train.py:563-583 ``create_dataset`` /
``create_loader`` over ImageFolder trees: root/class_name/image.png). Batches
are raw uint8 NHWC; augmentation happens on device.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

IMG_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp", ".webp")

VAL_DIR_NAMES = ("val", "validation", "valid")


def load_folder_datasets(root: str, image_size: Optional[int] = None):
    """(train_ds, val_ds) for a folder tree.

    timm convention (timm_train.py:563-583): if the root has a ``train/``
    subtree and a ``val``/``validation`` subtree, use them; otherwise the
    whole root is the train set and the caller decides how to split.
    """
    subdirs = {
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    }
    if "train" in subdirs:
        val_name = next((v for v in VAL_DIR_NAMES if v in subdirs), None)
        train_ds = ImageFolderDataset(
            os.path.join(root, "train"), image_size=image_size
        )
        val_ds = (
            ImageFolderDataset(os.path.join(root, val_name), image_size=image_size)
            if val_name
            else None
        )
        return train_ds, val_ds
    return ImageFolderDataset(root, image_size=image_size), None


class ImageFolderDataset:
    def __init__(self, root: str, image_size: Optional[int] = None):
        self.root = root
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if not classes:
            raise IOError(f"no class subdirectories under {root}")
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(IMG_EXTS):
                    self.samples.append((os.path.join(cdir, fn), self.class_to_idx[c]))
        self.image_size = image_size

    @property
    def num_classes(self) -> int:
        return len(self.class_to_idx)

    def subset(self, indices) -> "ImageFolderDataset":
        """Shallow view over a sample subset (same class map)."""
        import copy

        ds = copy.copy(self)
        ds.samples = [self.samples[int(i)] for i in indices]
        return ds

    def split(self, fraction: float = 0.8, rng=None):
        """Random train/val split (timm --val-split analogue for folder
        trees without an explicit val/ directory)."""
        rng = rng or np.random.default_rng(0)
        order = rng.permutation(len(self.samples))
        n_train = int(round(len(order) * fraction))
        return self.subset(order[:n_train]), self.subset(order[n_train:])

    def __len__(self):
        return len(self.samples)

    def load(self, idx: int) -> np.ndarray:
        path, _ = self.samples[idx]
        img = Image.open(path).convert("RGB")
        if self.image_size is not None and img.size != (self.image_size,) * 2:
            img = img.resize((self.image_size, self.image_size))
        return np.asarray(img, dtype=np.uint8)

    def batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.samples))
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        order = order[process_index::process_count]
        end = len(order) - (batch_size - 1 if drop_last else 0)
        for start in range(0, max(end, 0), batch_size):
            chunk = order[start : start + batch_size]
            images = np.stack([self.load(int(i)) for i in chunk])
            labels = np.asarray(
                [self.samples[int(i)][1] for i in chunk], dtype=np.int64
            )
            yield {"images": images, "labels": labels}
