"""Dataset/loader factories — reference data/__init__.py parity (§2.4 [H]).

create_dataset: string dispatch on opt['mode'] (REDS | Vimeo90K |
video_test | meta) exactly like the reference. create_dataloader returns a
background-thread prefetching iterator yielding stacked numpy batches,
sharded per process like DistIterSampler (data/data_sampler.py [H]):
each host draws a disjoint deterministic index stream; device placement
(NamedSharding over the ('data',) mesh) happens in parallel/mesh.py.

TPU-first notes: the reference used torch DataLoader worker PROCESSES;
cv2 decode releases the GIL, so a small thread pool saturates host decode
here without pickling overhead. Batches are plain numpy — `shard_batch`
device_puts them sharded, overlapping H2D with compute via double-buffer.
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Mapping, Optional

import numpy as np

from dynavsr_tpu.data.datasets import (
    MetaVideoDataset,
    REDSDataset,
    VideoTestDataset,
    Vimeo90KDataset,
    Vimeo90KTestDataset,
)

__all__ = ["create_dataset", "create_dataloader", "PrefetchLoader"]


def create_dataset(dataset_opt: Mapping):
    mode = dataset_opt["mode"]
    if mode == "REDS":
        return REDSDataset(dataset_opt)
    if mode == "Vimeo90K":
        return Vimeo90KDataset(dataset_opt)
    if mode in ("video_test", "video_samedirs", "Vid4", "REDS4"):
        return VideoTestDataset(dataset_opt)
    if mode in ("Vimeo90K_test", "vimeo90k_test"):
        return Vimeo90KTestDataset(dataset_opt)
    if mode in ("meta", "meta_learner", "MetaREDS", "MetaVimeo"):
        return MetaVideoDataset(dataset_opt)
    raise NotImplementedError(f"Dataset [{mode}] is not recognized.")


def _epoch_indices(n: int, seed: int, epoch: int, ratio: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed + epoch)
    return np.concatenate([rng.permutation(n) for _ in range(max(1, ratio))])


class PrefetchLoader:
    """Iterates a dataset in shuffled, process-sharded batches with a
    background thread pool decoding ahead."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 3,
        prefetch: int = 4,
        drop_last: bool = True,
        ratio: int = 1,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.ratio = ratio
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        self._skip_batches = 0

    def set_epoch(self, epoch: int) -> None:
        """Reference DistIterSampler.set_epoch [H]: reseeds the shuffle."""
        self.epoch = epoch

    def set_skip_batches(self, n: int) -> None:
        """Deterministic resume skip-ahead (SURVEY.md §5 failure-recovery
        note): the next __iter__ starts at batch n of the epoch so a
        resumed run sees exactly the batches it would have — indices AND
        per-item augmentation RNG are pure functions of
        (seed, epoch, stream position); skipping happens before decode."""
        self._skip_batches = n

    def _fetch(self, index: int, stream_pos: int):
        """Decode one item with its position-derived RNG (bit-identical
        across skip-ahead resume; see set_skip_batches)."""
        get = getattr(self.dataset, "get_item", None)
        if get is None:
            return self.dataset[int(index)]
        rng = random.Random(hash((self.seed, self.epoch, int(stream_pos))))
        return get(int(index), rng)

    def _index_stream(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            idx = _epoch_indices(n, self.seed, self.epoch, self.ratio)
        else:
            idx = np.arange(n)
        return idx[self.process_index :: self.process_count]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._index_stream()
        nb = len(idx) // self.batch_size
        if not self.drop_last and len(idx) % self.batch_size:
            nb += 1
        first = min(self._skip_batches, nb)
        self._skip_batches = 0
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # cv2 decode releases the GIL, so a thread pool the size of
            # n_workers parallelizes the per-item fetch within each batch.
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                    for b in range(first, nb):
                        if stop.is_set():
                            return
                        batch_idx = idx[b * self.batch_size : (b + 1) * self.batch_size]
                        pos0 = b * self.batch_size
                        items = list(
                            ex.map(self._fetch, batch_idx, range(pos0, pos0 + len(batch_idx)))
                        )
                        batch: Dict[str, np.ndarray] = {}
                        for k in items[0]:
                            v0 = items[0][k]
                            if isinstance(v0, np.ndarray):
                                batch[k] = np.stack([it[k] for it in items], axis=0)
                            else:
                                batch[k] = [it[k] for it in items]  # type: ignore[assignment]
                        out_q.put(batch)
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def __len__(self) -> int:
        return len(self._index_stream()) // self.batch_size


def create_dataloader(
    dataset,
    dataset_opt: Mapping,
    opt: Optional[Mapping] = None,
    sampler=None,
) -> PrefetchLoader:
    """Reference create_dataloader signature [H]: train -> shuffled sharded
    batches; val/test -> batch 1, no shuffle."""
    phase = dataset_opt.get("phase", "test")
    try:
        import jax

        pi, pc = jax.process_index(), jax.process_count()
    except Exception:
        pi, pc = 0, 1
    if phase == "train":
        return PrefetchLoader(
            dataset,
            batch_size=dataset_opt.get("batch_size", 16),
            shuffle=dataset_opt.get("use_shuffle", True) is not False,
            seed=(opt or {}).get("train", {}).get("manual_seed") or 0,
            num_workers=dataset_opt.get("n_workers", 3),
            process_index=pi,
            process_count=pc,
        )
    return PrefetchLoader(
        dataset, batch_size=1, shuffle=False, drop_last=False,
        process_index=0, process_count=1,
    )
