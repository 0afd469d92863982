"""Multiprocess data loader with background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(ref: pcdet/datasets/__init__.py:45-74) with a framework-free loader:
worker processes run ``dataset[i] → collate`` and a prefetch queue overlaps
host data prep with TPU steps. Per-host sharding for multi-process data
parallelism mirrors DistributedSampler's rank/num_replicas split.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading

import numpy as np


class Loader:
    def __init__(self, dataset, batch_size, shuffle=True, num_workers=0,
                 seed=0, drop_last=True, rank=0, world_size=1, prefetch=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.rank = rank
        self.world_size = world_size
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def merge_all_iters_to_one_epoch(self, merge: bool = True,
                                     epochs: int = 1):
        """Fold ``epochs`` independently-shuffled passes into one epoch-long
        stream (ref: datasets/__init__.py:69-74 + dataset.py
        merge_all_iters_to_one_epoch): removes epoch-boundary overhead and
        gives the scheduler one continuous iteration count."""
        self._merged_epochs = int(epochs) if merge else None

    def _indices(self):
        n = len(self.dataset)
        merged = getattr(self, "_merged_epochs", None)
        if merged:
            parts = []
            for e in range(merged):
                idx_e = np.arange(n)
                if self.shuffle:
                    rng = np.random.default_rng(self.seed + e)
                    idx_e = rng.permutation(n)
                parts.append(idx_e)
            idx = np.concatenate(parts)
        else:
            idx = np.arange(n)
            if self.shuffle:
                rng = np.random.default_rng(self.seed + self.epoch)
                idx = rng.permutation(n)
        # rank sharding (≙ DistributedSampler)
        idx = idx[self.rank::self.world_size]
        steps = len(idx) // self.batch_size
        if not self.drop_last and len(idx) % self.batch_size:
            steps += 1
        return idx, steps

    def __len__(self):
        _, steps = self._indices()
        return steps

    def _make_batch(self, batch_idx):
        samples = [self.dataset[int(i)] for i in batch_idx]
        n_real = len(samples)
        # static-shape discipline: a partial final batch (drop_last=False,
        # e.g. eval splits not divisible by batch_size) is padded by
        # repeating the last sample; `n_real` lets consumers skip the pads
        # (ref crash mode: eval_utils indexing gt[b] past len(batch_list))
        while len(samples) < self.batch_size:
            samples.append(samples[-1])
        batch = self.dataset.collate_batch(samples)
        batch["n_real"] = n_real
        return batch

    def __iter__(self):
        idx, steps = self._indices()
        batches = [
            idx[s * self.batch_size:(s + 1) * self.batch_size]
            for s in range(steps)
        ]
        if self.num_workers <= 0:
            for b in batches:
                yield self._make_batch(b)
            return

        # thread-pool prefetch (dataset objects stay in-process; numpy work
        # releases the GIL enough in practice, and process pools require the
        # dataset to be picklable — kept as a follow-up optimization)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for b in batches:
                if stop.is_set():
                    return
                out_q.put(self._make_batch(b))
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def build_dataloader(dataset_cfg, class_names, batch_size, training,
                     workers=4, seed=0, logger=None, root_path=None,
                     rank=0, world_size=1):
    """Dataset + Loader construction (ref: datasets/__init__.py:45-74)."""
    from . import build_dataset

    dataset = build_dataset(
        dataset_cfg=dataset_cfg, class_names=class_names, training=training,
        root_path=root_path, logger=logger,
    )
    loader = Loader(
        dataset, batch_size=batch_size, shuffle=training,
        num_workers=workers, seed=seed, drop_last=training,
        rank=rank, world_size=world_size,
    )
    return dataset, loader
