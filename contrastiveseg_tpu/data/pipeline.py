"""Host-side input pipeline: sample -> augment -> normalize -> collate ->
(sharded) device arrays, with background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(lib/datasets/data_loader.py:81-146).  Multi-host sharding follows the JAX
recipe: every host reads its own `process_index`-strided subset and the
global batch is assembled with ``jax.make_array_from_process_local_data``.

Parallelism model (`data.workers`, the reference's DataLoader
num_workers): a thread pool, not processes.  The hot aug kernels
(bicubic window resize, nearest resize, normalize — native/segdata.cpp)
are ctypes calls that release the GIL, and numpy's bulk ops do too, so
threads scale across host cores without the fork hazards or the
60 MB/batch IPC copies of a process pool.  Batch RNG is derived per
batch index (SeedSequence (base, b)), so the produced stream is
IDENTICAL for any worker count, including 0.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import numpy as np

from contrastiveseg_tpu.data.collate import collate
from contrastiveseg_tpu.data.transforms import Compose, Normalizer, build_train_transforms


class DataPipeline:
    def __init__(
        self,
        dataset,
        batch_size: int,
        transforms: Optional[Compose] = None,
        normalizer: Optional[Normalizer] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        collate_kwargs: Optional[dict] = None,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.transforms = transforms
        self.normalizer = normalizer or Normalizer()
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.collate_kwargs = collate_kwargs or {
            "size_mode": "fix_size",
            "input_size": (1024, 512),
            "align_method": "only_pad",
            "pad_mode": "random",
        }
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.num_workers = max(0, min(int(num_workers), 32))
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        if self.shuffle and hasattr(self.dataset, "balanced_indices"):
            # Multi-dataset balanced sampler (multi_dataset_loader.py:124).
            idx = self.dataset.balanced_indices(epoch, self.seed)
        else:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                # Same permutation on every host; each host takes its slice.
                np.random.default_rng(self.seed + epoch).shuffle(idx)
        if self.num_shards == 1:
            return idx
        # Per-batch CONTIGUOUS host slices: global batch b is
        # idx[b*G:(b+1)*G] and host p owns rows [p*L:(p+1)*L] of it, so the
        # global array assembled by shard_batch (process-p devices hold the
        # p-th block) is bit-identical to the single-process stream — a
        # strictly stronger property than the reference DistributedSampler's
        # strided union (same set, permuted order).
        L, S = self.batch_size, self.num_shards
        G = L * S
        nb = len(idx) // G
        head = idx[: nb * G].reshape(nb, S, L)[:, self.shard_index].reshape(-1)
        # Remainder (only reachable with drop_last=False): strided split.
        tail = idx[nb * G :][self.shard_index :: S]
        return np.concatenate([head, tail])

    def _make_batch(self, indices, rng: np.random.Generator) -> dict:
        # Under only_pad + fix-shape modes, uint8 images skip the eager
        # normalize: collate's fused native path normalizes+pads them
        # straight into the batch canvas (bit-identical, zero copies).
        defer_norm = (
            self.collate_kwargs.get("align_method", "only_pad") == "only_pad"
            and self.collate_kwargs.get("size_mode", "fix_size")
            != "diverse_size"
        )
        samples = []
        for i in indices:
            s = self.dataset[int(i)]
            if self.transforms is not None:
                s = self.transforms(s, rng)
            s = dict(s)
            if not (defer_norm and s["image"].dtype == np.uint8):
                s["image"] = self.normalizer(s["image"])
            samples.append(s)
        batch = collate(
            samples, rng=rng,
            normalizer=self.normalizer if defer_norm else None,
            **self.collate_kwargs)
        if isinstance(batch["image"], list):  # diverse_size: per-image eval
            batch["image"] = [x.astype(np.float32, copy=False)
                              for x in batch["image"]]
            if "label" in batch:
                batch["label"] = [x.astype(np.int32, copy=False)
                                  for x in batch["label"]]
            return batch
        if "label" in batch:
            batch["label"] = batch["label"].astype(np.int32, copy=False)
        batch["image"] = batch["image"].astype(np.float32, copy=False)
        return batch

    def epoch_iter(self, epoch: int) -> Iterator[dict]:
        indices = self._epoch_indices(epoch)
        nb = len(indices) // self.batch_size if self.drop_last else -(
            -len(indices) // self.batch_size
        )
        base = (self.seed + epoch) * 1000003 + self.shard_index

        def batch_rng(b: int) -> np.random.Generator:
            # Random-access per-batch stream: the same batch index always
            # yields the same augmentations, for ANY worker count.
            return np.random.default_rng(np.random.SeedSequence((base, b)))

        def chunk(b: int):
            return indices[b * self.batch_size : (b + 1) * self.batch_size]

        if self.num_workers >= 2:
            with ThreadPoolExecutor(self.num_workers) as pool:
                inflight: deque = deque()
                ahead = self.num_workers + self.prefetch
                nxt = 0
                while nxt < min(ahead, nb):
                    inflight.append(
                        pool.submit(self._make_batch, chunk(nxt),
                                    batch_rng(nxt)))
                    nxt += 1
                while inflight:
                    item = inflight.popleft().result()
                    if nxt < nb:
                        inflight.append(
                            pool.submit(self._make_batch, chunk(nxt),
                                        batch_rng(nxt)))
                        nxt += 1
                    yield item
            return

        def producer(q: queue.Queue):
            for b in range(nb):
                q.put(self._make_batch(chunk(b), batch_rng(b)))
            q.put(None)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=producer, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item

    def __iter__(self) -> Iterator[dict]:
        """Infinite iterator over epochs (the reference trains by iters)."""
        epoch = self.epoch
        while True:
            yield from self.epoch_iter(epoch)
            epoch += 1
            self.epoch = epoch


def build_pipeline(cfg, split: str = "train", dataset=None) -> DataPipeline:
    from contrastiveseg_tpu.data.datasets import build_dataset

    dataset = dataset or build_dataset(cfg, split)
    section = "train" if split == "train" else split
    trans_section = "train_trans" if split == "train" else "val_trans"
    td = cfg.get(f"{section}.data_transformer", default={})
    collate_kwargs = {
        "size_mode": td.get("size_mode", "fix_size"),
        "input_size": tuple(td.get("input_size", (1024, 512))),
        "align_method": td.get("align_method", "only_pad"),
        "pad_mode": td.get("pad_mode", "random"),
    }
    if "ms_input_size" in td:
        collate_kwargs["ms_input_size"] = td["ms_input_size"]
    if "fit_stride" in td:
        collate_kwargs["fit_stride"] = td["fit_stride"]
    norm = cfg.get("normalize", default={})
    # Multi-host: `{section}.batch_size` is the GLOBAL batch; each host
    # produces its 1/process_count slice and shard_batch (parallel/mesh.py)
    # assembles the global array.  Mirrors the reference's
    # `batch_size // world_size` (lib/datasets/data_loader.py:137-138).
    procs = jax.process_count()
    global_bs = cfg.get(f"{section}.batch_size", default=8)
    if global_bs % procs != 0:
        raise ValueError(
            f"{section}.batch_size={global_bs} not divisible by "
            f"process_count={procs}")
    workers = cfg.get("data.workers", default=0)
    return DataPipeline(
        dataset,
        batch_size=global_bs // procs,
        transforms=build_train_transforms(cfg, trans_section),
        normalizer=Normalizer(
            div_value=norm.get("div_value", 255.0),
            mean=norm.get("mean_value", (0.485, 0.456, 0.406)),
            std=norm.get("std", (0.229, 0.224, 0.225)),
        ),
        shuffle=split == "train",
        drop_last=split == "train",
        collate_kwargs=collate_kwargs,
        num_shards=procs,
        shard_index=jax.process_index(),
        num_workers=workers // procs if procs > 1 else workers,
    )
