"""WSI tile sampling pipelines.

Parity: ``WSI_REGdataset`` (datasets.py:560-631) — bag_size=1 tile-level
training with ``factor = n_tiles`` virtual epochs (:427-429) — and the MIL
bag view (train_type='MIL', bag_size tiles per draw). The torch
DataLoader-worker model is replaced TPU-style: a thread pool overlaps slide
I/O/decode with device steps, batches are raw uint8 (all augmentation runs on
device inside the jitted step), and a double-buffered prefetcher keeps the
chip fed.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from tpuwsi.io.grids import grid_file_path, load_grid_pickle
from tpuwsi.io.levels import get_optimal_slide_level
from tpuwsi.io.metadata import SlideTable
from tpuwsi.io.slide_readers import SlideReader, open_slide
from tpuwsi.io.tiles import TileStats, choose_locations, get_tiles


class WSITileSampler:
    """Random-tile sampler over a SlideTable (REG/MIL semantics)."""

    def __init__(
        self,
        table: SlideTable,
        n_tiles: int = 10,
        bag_size: int = 1,
        random_shift: bool = True,
        readers: Optional[Dict[int, SlideReader]] = None,
        num_threads: int = 8,
        balanced_sampling: bool = False,
        test_time_augmentation: bool = False,
        loan: bool = False,
        print_timing: bool = False,
    ):
        self.table = table
        # TTA draws each slide 4× at eval (datasets.py:433-435)
        self.n_tiles = 4 if test_time_augmentation else n_tiles
        self.bag_size = bag_size
        self.random_shift = random_shift
        self.balanced_sampling = balanced_sampling
        # --loan: per-tile labels from QuPath local_labels masks replace the
        # slide target (train.py:380, utils.py:144-149/183-196)
        self.loan = loan
        self.stats = TileStats()
        from tpuwsi.utils.profiling import StageTimer

        # -time parity (datasets.py:512-526): per-stage extraction timing
        self.stage_timer = StageTimer(enabled=print_timing)
        self._readers = readers or {}
        self._grids: Dict[int, list] = {}
        self._loans: Dict[int, object] = {}
        self._level_cache: Dict[int, tuple] = {}
        self._pool = ThreadPoolExecutor(max_workers=num_threads)
        # RLock: _loan() holds the lock and opens the reader via _reader()
        self._lock = threading.RLock()

    # -- lazy per-slide state -------------------------------------------------
    def _reader(self, idx: int) -> SlideReader:
        with self._lock:
            if idx not in self._readers:
                self._readers[idx] = open_slide(self.table.slide_path(idx))
            return self._readers[idx]

    def _grid(self, idx: int) -> list:
        with self._lock:
            if idx not in self._grids:
                path = grid_file_path(
                    self.table.path_names[idx],
                    self.table.file_names[idx],
                    self.table.desired_magnification,
                    self.table.tile_size,
                )
                self._grids[idx] = load_grid_pickle(path)
            return self._grids[idx]

    def _levels(self, idx: int) -> tuple:
        if idx not in self._level_cache:
            reader = self._reader(idx)
            self._level_cache[idx] = get_optimal_slide_level(
                reader.level_downsamples,
                self.table.magnifications[idx],
                self.table.desired_magnification,
                self.table.tile_size,
            )
        return self._level_cache[idx]

    # -- sampling --------------------------------------------------------------
    def sample_slide(self, idx: int, rng: np.random.Generator, n: int) -> np.ndarray:
        if self.table.dataset.startswith("TMA"):
            # TMA core images (datasets.py:471-478): whole jpg, crop the width
            # margin to 1440, resize to 512²; BGR channel order reproduced by
            # the mirrored reader + 'Amir' normalization bank.
            from PIL import Image

            from tpuwsi.io.slide_readers import ImageSlideReader

            reader = ImageSlideReader(self.table.slide_path(idx), mirror_bgr=True)
            arr = reader.read_region((0, 0), 0, reader.dimensions)
            w_margin = (arr.shape[1] - 1440) // 2
            if w_margin > 0:
                arr = arr[:, w_margin:-w_margin]
            out_sz = self.table.tile_size
            arr = np.asarray(
                Image.fromarray(arr).resize((out_sz, out_sz), Image.BILINEAR)
            )
            return np.repeat(arr[None], n, axis=0)
        if self.table.cohort_ids[idx] == "ABCTB_TILES":
            # presaved-tile cohort (datasets.py:452-467)
            from tpuwsi.io.presaved import sample_presaved_tiles, tiles_dir_for_slide

            return sample_presaved_tiles(
                tiles_dir_for_slide(
                    self.table.path_names[idx], self.table.file_names[idx]
                ),
                int(self.table.tissue_tiles[idx]),
                n,
                self.table.tile_size,
                rng,
            )
        reader = self._reader(idx)
        grid = self._grid(idx)
        best_level, adjusted, level0 = self._levels(idx)
        locs = choose_locations(rng, grid, n)
        with self.stage_timer.stage("Average time to extract a tile"):
            result = get_tiles(
                reader,
                locs,
                level0,
                adjusted,
                self.table.tile_size,
                best_level,
                rng=rng,
                random_shift=self.random_shift,
                stats=self.stats,
                loan=self._loan(idx) if self.loan else None,
            )
        if self.loan and not isinstance(result, tuple):
            # loan requested but this slide has no annotation file: label -1
            result = (result, np.zeros(n, dtype=np.int64) - 1)
        return result

    def _loan(self, idx: int):
        with self._lock:
            if idx not in self._loans:
                from tpuwsi.io.loan import load_loan_annotation

                reader = self._reader(idx)
                self._loans[idx] = load_loan_annotation(
                    self.table.slide_path(idx),
                    bounds=getattr(reader, "bounds", (0, 0)),
                )
            return self._loans[idx]

    def __len__(self):
        # REG virtual epoch length (datasets.py:427-429, 445-446)
        return len(self.table) * self.n_tiles

    def epoch_indices(self, rng: np.random.Generator) -> np.ndarray:
        if self.balanced_sampling:
            # WeightedRandomSampler parity (train.py:719-731): sample slides
            # with replacement, weight ∝ 1 / class frequency.  The reference
            # initializes weights to zero and only assigns 'Positive'/'Negative'
            # entries, so unknown targets (label -1) get weight 0 — never
            # sampled — and do not distort the class counts.
            labels = self.table.labels().reshape(len(self.table), -1)[:, 0]
            weights = np.zeros(len(labels), dtype=np.float64)
            n_pos = int(np.sum(labels == 1))
            n_neg = int(np.sum(labels == 0))
            if n_pos:
                weights[labels == 1] = 1.0 / n_pos
            if n_neg:
                weights[labels == 0] = 1.0 / n_neg
            if weights.sum() == 0:
                weights[:] = 1.0
            weights = weights / weights.sum()
            return rng.choice(
                len(self.table), size=len(self), replace=True, p=weights
            )
        idx = np.repeat(np.arange(len(self.table)), self.n_tiles)
        rng.shuffle(idx)
        return idx

    def process_order(
        self, rng: np.random.Generator, process_index: int = 0,
        process_count: int = 1,
    ) -> np.ndarray:
        """This process's strided slice of the epoch index stream
        (DistributedSampler semantics: all hosts shuffle with the SAME seed,
        then rank p takes every p-th element — slices are disjoint positions
        that partition the epoch).

        Truncated to the COMMON per-host length: with N % process_count != 0
        some hosts would get one extra element, their batch counts could
        differ, and the long hosts would enter a collective the short hosts
        never join — a multi-host deadlock (DistributedSampler pads for the
        same reason; truncation keeps every global batch full)."""
        idx = self.epoch_indices(rng)
        per_host = len(idx) // process_count
        return idx[process_index::process_count][:per_host]

    def batches(
        self,
        rng: np.random.Generator,
        batch_size: int,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield {'images': (B, ts, ts, 3) u8, 'labels': (B,)} batches.

        Per-host data sharding (SURVEY §5.8): each process takes a strided
        slice of the epoch index stream (replaces DistributedSampler rank
        sharding).
        """
        labels = self.table.labels()
        order = self.process_order(rng, process_index, process_count)
        ts = self.table.tile_size
        bs = self.bag_size
        for start in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                           batch_size):
            chunk = order[start : start + batch_size]
            if len(chunk) == 0:
                break
            seeds = rng.integers(0, 2 ** 31, size=len(chunk))
            futures = [
                self._pool.submit(
                    self.sample_slide, int(i), np.random.default_rng(int(s)), bs
                )
                for i, s in zip(chunk, seeds)
            ]
            results = [f.result() for f in futures]
            if self.loan:
                tiles = np.stack(
                    [r[0] if isinstance(r, tuple) else r for r in results]
                )
                tile_labels = np.stack(
                    [
                        r[1] if isinstance(r, tuple)
                        else np.zeros(bs, dtype=np.int64) - 1
                        for r in results
                    ]
                )  # (B, bag)
                batch_labels = tile_labels[:, 0] if bs == 1 else tile_labels
            else:
                tiles = np.stack(results)  # (B, bag, ts, ts, 3)
                batch_labels = (
                    labels[chunk][:, 0]
                    if labels.ndim > 1 and not self.table.multi_target
                    else labels[chunk]
                )
            batch = {
                "labels": batch_labels,
                "slide_indices": chunk.astype(np.int64),
            }
            if bs == 1:
                batch["images"] = tiles[:, 0]  # REG squeeze (datasets.py:618)
            else:
                batch["images"] = tiles
            yield batch


class Prefetcher:
    """Background-thread batch prefetcher (double/triple buffering).

    Producer exceptions are captured and re-raised in the CONSUMER (a
    swallowed read error would otherwise silently truncate the epoch), and
    ``close()`` unblocks + retires the producer when the consumer stops
    early (``--max-steps-per-epoch`` / eval break) so long runs don't
    accumulate threads parked on a full queue."""

    def __init__(self, iterator, depth: int = 3, transform=None):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._transform = transform
        self._done = object()
        self._iterator = iterator
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._finished = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """put with stop-responsiveness; False = consumer closed us."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _run(self):
        try:
            for item in self._iterator:
                if self._transform is not None:
                    item = self._transform(item)
                if not self._put(item):
                    return
        except BaseException as e:  # re-raised consumer-side
            self._err = e
        finally:
            self._put(self._done)

    def close(self):
        """Stop the producer and drain the queue (idempotent)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)

    def __iter__(self):
        return self

    def __next__(self):
        if self._finished:
            raise StopIteration
        item = self._q.get()
        if item is self._done:
            self._finished = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
