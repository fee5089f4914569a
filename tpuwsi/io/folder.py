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


def load_class_map(path: str) -> Dict[str, int]:
    """timm --class-map: text file with one class name per line; the index
    is the line number (timm.data.load_class_map)."""
    with open(path) as f:
        names = [line.strip() for line in f if line.strip()]
    return {name: i for i, name in enumerate(names)}


def load_folder_datasets(
    root: str,
    image_size: Optional[int] = None,
    train_split: str = "train",
    class_map: Optional[str] = None,
    channels: int = 3,
):
    """(train_ds, val_ds) for a folder tree.

    timm convention (timm_train.py:563-583): if the root has a
    ``<train_split>/`` subtree (timm --train-split, default 'train') and a
    ``val``/``validation`` subtree, use them; otherwise the whole root is
    the train set and the caller decides how to split. ``class_map`` is a
    timm --class-map file fixing the class_name→index assignment.
    """
    cmap = load_class_map(class_map) if class_map else None
    subdirs = {
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    }
    if train_split in subdirs:
        val_name = next((v for v in VAL_DIR_NAMES if v in subdirs), None)
        train_ds = ImageFolderDataset(
            os.path.join(root, train_split), image_size=image_size,
            class_map=cmap, channels=channels,
        )
        # the val split inherits the TRAIN split's class->index map when no
        # explicit --class-map is given: deriving indices independently from
        # each split's subdirs silently shifts every later class when one is
        # absent from a split (timm shares one class map the same way)
        val_ds = (
            ImageFolderDataset(os.path.join(root, val_name),
                               image_size=image_size,
                               class_map=cmap or train_ds.class_to_idx,
                               channels=channels)
            if val_name
            else None
        )
        return train_ds, val_ds
    return ImageFolderDataset(root, image_size=image_size, class_map=cmap,
                              channels=channels), None


class ImageFolderDataset:
    def __init__(self, root: str, image_size: Optional[int] = None,
                 class_map: Optional[Dict[str, int]] = None,
                 channels: int = 3):
        if channels not in (1, 3):
            raise ValueError("channels must be 1 or 3")
        self.channels = channels
        self.root = root
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if not classes:
            raise IOError(f"no class subdirectories under {root}")
        if class_map is not None:
            missing = [c for c in classes if c not in class_map]
            if missing:
                raise KeyError(
                    f"class dirs {missing} not in the --class-map file"
                )
            self.class_to_idx = {c: class_map[c] for c in classes}
            # index space = the full map, not just the dirs present in THIS
            # split (a class can be absent from train/ but present in val/)
            self._num_classes = max(class_map.values()) + 1
        else:
            self.class_to_idx = {c: i for i, c in enumerate(classes)}
            self._num_classes = len(classes)
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(IMG_EXTS):
                    self.samples.append((os.path.join(cdir, fn), self.class_to_idx[c]))
        self.image_size = image_size

    @property
    def num_classes(self) -> int:
        return self._num_classes

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
        img = Image.open(path).convert(
            "L" if self.channels == 1 else "RGB"
        )
        if self.image_size is not None and img.size != (self.image_size,) * 2:
            img = img.resize((self.image_size, self.image_size))
        arr = np.asarray(img, dtype=np.uint8)
        if self.channels == 1:
            arr = arr[..., None]
        return arr

    def batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        repeats: int = 1,
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.samples))
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        if repeats > 1:
            # timm --aug-repeats (RASampler/DeiT repeated augmentation):
            # adjacent repeated instances, truncated so the epoch length is
            # unchanged — each epoch sees ~len/repeats unique images, and
            # the repeats land in the same batch where each gets an
            # independent on-device augmentation draw.
            order = np.repeat(order, repeats)[: len(self.samples)]
        # common per-host length: unequal strided slices would give hosts
        # different batch counts and deadlock the collectives (see
        # WSITileSampler.process_order)
        order = order[process_index::process_count][
            : len(order) // process_count
        ]
        end = len(order) - (batch_size - 1 if drop_last else 0)
        for start in range(0, max(end, 0), batch_size):
            chunk = order[start : start + batch_size]
            images = np.stack([self.load(int(i)) for i in chunk])
            labels = np.asarray(
                [self.samples[int(i)][1] for i in chunk], dtype=np.int64
            )
            yield {"images": images, "labels": labels}
