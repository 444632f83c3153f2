"""Host input pipeline: sharded, shuffled, prefetching batch loader.

Replaces DataLoader + DistributedSampler (run_cyclical.py:474-494): the
dataset is sharded by host (SPMD single-controller — one process per host,
devices fed via device_put of the host's shard), epochs reshuffle with
`seed + epoch` like DistributedSampler.set_epoch, and a background thread
pool prefetches+decodes batches while the device computes. Output batches
are raw uint8 [B, H, W, C] + int labels; augmentation runs on device
(ops/augment.py)."""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Tuple

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        host_id: int = 0,
        num_hosts: int = 1,
        prefetch: int = 4,
        pad_shards: bool | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch
        # Shard-padding policy. Training (shuffle or drop_last) needs equal
        # shard sizes so every host dispatches the same number of lockstep
        # steps — pad by wrapping, like DistributedSampler. Eval loops are
        # host-local (evals/classification.py collects logits per host, no
        # in-loop collectives), and padded duplicates would skew the global
        # metrics — so the eval configuration defaults to UNEVEN, unpadded
        # shards: the union over hosts is the dataset exactly once.
        if pad_shards is None:
            pad_shards = shuffle or drop_last
        self.pad_shards = pad_shards
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        # per-host shard (DistributedSampler semantics: pad to equal shards;
        # eval default is unpadded/uneven — see pad_shards in __init__)
        if self.num_hosts > 1:
            if self.pad_shards:
                per_host = (n + self.num_hosts - 1) // self.num_hosts
                padded = np.concatenate([idx, idx[: per_host * self.num_hosts - n]])
                idx = padded[self.host_id :: self.num_hosts]
            else:
                idx = idx[self.host_id :: self.num_hosts]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _load_batch(self, batch_idx: np.ndarray):
        # fast path: GIL-free batched decode in the C++ IO runtime
        if hasattr(self.dataset, "native_batch_decode") and getattr(
            self.dataset, "decode_size", None
        ):
            return self.dataset.native_batch_decode(
                batch_idx, num_threads=max(self.num_workers, 1)
            )

        items = [self.dataset[int(i)] for i in batch_idx]
        cols = list(zip(*items))
        from uncertainty_vit_tpu.utils import native

        out = []
        for col in cols[:-1]:
            out.append(native.assemble_batch(list(col)))
        out.append(np.asarray(cols[-1], np.int64))
        return tuple(out)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        idx = self._indices()
        nb = len(self)
        batches = [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

        if self.num_workers <= 0:
            for b in batches:
                yield self._load_batch(b)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                import concurrent.futures as cf

                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    futures = []
                    for b in batches:
                        if stop.is_set():
                            return
                        futures.append(pool.submit(self._load_batch, b))
                        # keep a bounded window of in-flight batches
                        while len(futures) > self.prefetch:
                            q.put(("ok", futures.pop(0).result()))
                            if stop.is_set():
                                return
                    for f in futures:
                        if stop.is_set():
                            return
                        q.put(("ok", f.result()))
            except Exception as e:  # surface worker errors on the consumer
                q.put(("err", e))
            finally:
                q.put(("done", None))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "ok":
                    yield payload
                elif kind == "err":
                    raise payload
                else:
                    return
        finally:
            stop.set()


class device_prefetch:
    """Overlap host→device transfers with compute: device_put is async, so
    dispatching the next batch's transfer before yielding the current one
    hides the H2D copy behind the train step (the reference relies on
    pin_memory + non_blocking H2D for the same effect, run_cyclical.py:58-60).
    Preserves len() of the wrapped loader for ETA reporting."""

    def __init__(self, iterable, size: int = 2):
        self.iterable = iterable
        self.size = size

    def __len__(self):
        return len(self.iterable)

    def __iter__(self):
        import collections

        import jax
        import jax.numpy as jnp

        buf = collections.deque()

        def put(item):
            return jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, item
            )

        for item in self.iterable:
            buf.append(put(item))
            if len(buf) >= self.size:
                yield buf.popleft()
        while buf:
            yield buf.popleft()
