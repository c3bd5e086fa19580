"""Batched host->device data loader.

Replaces the reference's torch DataLoader with worker processes
(main.py:136-141) with a simple vectorized numpy pipeline: shuffle indices,
gather a uint8 batch, run the batch transform (crop/flip/normalize), and
hand float32 NHWC arrays to jit. For TPU, static batch shapes matter more
than worker parallelism — the final partial batch is dropped (train) or
padded (eval) so every step compiles once.

Memory model: datasets exposing flat ``images``/``labels`` arrays (CIFAR,
synthetic, memory-mapped stores) are gathered per batch with zero extra
copies of the full store (a np.memmap pages in only the touched samples);
anything else is STREAMED — ``dataset[i]`` is called per batch element
inside the iterator, so RSS stays bounded by batch_size regardless of
dataset size (ImageNet train would be ~150 GB materialized).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        transform: Optional[Callable] = None,
        seed: int = 0,
        drop_last: bool = True,
        pad_last: bool = False,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        """``num_shards``/``shard_id``: multi-host data sharding — each host
        iterates a disjoint strided slice of the (identically shuffled)
        index order, the DataLoader-worker analogue of DistributedSampler."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.transform = transform
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last
        self.pad_last = pad_last
        assert 0 <= shard_id < num_shards
        self.num_shards = num_shards
        self.shard_id = shard_id

        # Flat-array fast path: per-batch fancy-index gathers (no full-store
        # copy; a label-subset wrapper's new_to_old remap stays an index
        # indirection). Otherwise stream per-sample from dataset[i].
        self._index = None
        if hasattr(dataset, "images") and hasattr(dataset, "labels"):
            self.images = dataset.images
            self.labels = np.asarray(dataset.labels)
            if hasattr(dataset, "new_to_old"):
                self._index = np.asarray(dataset.new_to_old)
                self.labels = self.labels[self._index]
            self._n = len(self.labels)
        else:
            self.images = None
            self.labels = None
            self._n = len(dataset)

    def _gather(self, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Fetch one batch of (images, labels) for dataset indices ``idx``."""
        if self.images is not None:
            src = self._index[idx] if self._index is not None else idx
            batch = None
            if (
                isinstance(self.images, np.ndarray)
                and self.images.dtype == np.uint8
                and self.images.flags.c_contiguous
            ):
                from .. import native

                if native.available():
                    # GIL-releasing C memcpy gather: overlaps with device
                    # dispatch under PrefetchLoader.
                    batch = native.gather_batch_u8(self.images, src)
            if batch is None:
                batch = self.images[src]
            return batch, self.labels[idx]
        samples = [self.dataset[int(i)] for i in idx]
        batch = np.stack([np.asarray(s[0]) for s in samples])
        labels = np.array([s[1] for s in samples])
        return batch, labels

    def _shard_size(self) -> int:
        # Every shard is padded to the same ceil(n / num_shards) length (see
        # __iter__) so all hosts run the same number of batches — unequal
        # counts would deadlock the SPMD step on the shorter hosts.
        return (self._n + self.num_shards - 1) // self.num_shards

    def __len__(self):
        # The iterator yields static shapes only: the final partial batch is
        # yielded iff pad_last (padded + masked), else dropped — len() must
        # agree in both modes.
        n = self._shard_size()
        if self.pad_last or not self.drop_last:
            return (n + self.batch_size - 1) // self.batch_size
        return n // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yields (images, labels, valid_mask) float32/int32/bool batches."""
        order = np.arange(self._n)
        if self.shuffle:
            self.rng.shuffle(order)
        real = np.ones(len(order), dtype=bool)
        if self.num_shards > 1:
            # DistributedSampler semantics: wrap the order so every shard
            # has exactly ceil(n / num_shards) samples — equal batch counts
            # on every host (a global collective per step requires it).
            # Wrapped duplicates are flagged not-real so eval metrics (which
            # are all-reduced across hosts) never double-count a sample.
            total = self._shard_size() * self.num_shards
            if total > len(order):
                # np.resize tiles cyclically — a single concat of
                # order[:total-n] clamps when the wrap exceeds the dataset
                # (num_shards >= n+2), leaving shards with UNEQUAL lengths
                # (the SPMD deadlock this padding exists to prevent) and a
                # valid mask misaligned with the indices.
                order = np.resize(order, total)
                real = np.concatenate(
                    [real, np.zeros(total - self._n, dtype=bool)]
                )
            order = order[self.shard_id :: self.num_shards]
            real = real[self.shard_id :: self.num_shards]
        n = len(order)
        bs = self.batch_size
        stop = n - (n % bs) if (self.drop_last and not self.pad_last) else n
        for start in range(0, stop, bs):
            idx = order[start : start + bs]
            valid = real[start : start + bs].copy()
            if len(idx) < bs and self.pad_last:
                # pad_last: equal static shapes, wrapped samples masked out.
                # Without pad_last (drop_last=False), the final batch is
                # yielded SHORT — torch DataLoader semantics; jit retraces
                # once for the remainder shape.
                pad = bs - len(idx)
                idx = np.concatenate([idx, np.zeros(pad, dtype=idx.dtype)])
                valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
            batch, labels = self._gather(idx)
            labels = labels.astype(np.int32)
            if self.transform is not None:
                batch = self.transform(batch)
            else:
                batch = batch.astype(np.float32)
            yield batch, labels, valid


class PrefetchLoader:
    """Background-thread prefetch wrapper: overlaps host-side batch
    assembly/augmentation with device compute.

    The reference overlaps via DataLoader worker *processes*
    (main.py:136-141); here one thread suffices because the hot host work —
    the native augmentation kernel (nbdt_tpu/native) — releases the GIL for
    the duration of the C call, so producer and the main thread's device
    dispatch genuinely run in parallel. ``depth`` bounds the queue so a slow
    consumer doesn't balloon host memory.
    """

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()
        errors = []
        stop = threading.Event()

        def _bounded_put(item) -> bool:
            # A plain q.put would block forever if the consumer abandoned
            # the epoch (early stop, an exception in the train step) with
            # the queue full — leaking the thread and its queued batches.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for item in self.loader:
                    if not _bounded_put(item):
                        return
            except BaseException as e:  # surface producer failures
                errors.append(e)
            finally:
                _bounded_put(_END)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                yield item
        finally:
            # Runs on normal exhaustion AND GeneratorExit/exception:
            # signal the producer, drain so a blocked put can observe the
            # flag, and reap the thread.
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)
        if errors:
            raise errors[0]
