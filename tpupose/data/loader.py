"""Batched, prefetching input pipeline — the MultiprocessIterator equivalent.

The reference feeds Chainer with ``MultiprocessIterator(loader, batchsize,
n_processes=loaderjob)`` plus a ``spawn`` start-method workaround
(``/root/reference/train_coco_pose_estimation.py:234-239``).  Here the same
capability is a worker *process pool* decoding/augmenting samples plus a
background assembly thread that keeps a bounded queue of ready batches, so
the host pipeline overlaps with device steps (double buffering); batches are
(optionally) placed directly onto the device mesh with the training
shardings.
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from typing import Iterator

import numpy as np

_WORKER_DATASET = None


def _worker_init(dataset, seed, rank_counter):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    # Every spawned worker receives a pickled copy of the dataset carrying
    # the SAME RandomState — reseed per worker or they would all draw
    # identical augmentation streams.  The seed derives from (loader seed,
    # worker rank), not the pid, so multi-worker runs stay reproducible.
    with rank_counter.get_lock():
        rank = rank_counter.value
        rank_counter.value += 1
    _WORKER_DATASET._rng = np.random.RandomState(
        (seed * 100003 + rank * 7919 + 1) % (2 ** 31))


def _worker_sample(index: int):
    """Load one sample; failures (corrupt image, bad annotation) degrade to
    None so one bad record can't kill the whole training run — the feeder
    skips it and the loader keeps streaming (the reference's closest
    analogue is its resample-on-missing-annotations loop,
    ``coco_data_loader.py:351-353``)."""
    try:
        return _WORKER_DATASET.sample(index)
    except Exception as e:  # noqa: BLE001 - worker must never crash
        print(f"[loader] sample {index} failed: {type(e).__name__}: {e}",
              flush=True)
        return None


def _try_sample(dataset, index: int):
    """Inline-mode counterpart of ``_worker_sample``'s fault tolerance."""
    try:
        return dataset.sample(index)
    except Exception as e:  # noqa: BLE001
        print(f"[loader] sample {index} failed: {type(e).__name__}: {e}",
              flush=True)
        return None


class BatchLoader:
    """Iterable over ``TrainBatch``es of host numpy arrays.

    num_workers=0 loads inline (SerialIterator parity); >0 uses a spawn
    process pool (MultiprocessIterator parity, including the reference's
    spawn-start-method bug workaround).
    """

    def __init__(self, dataset, batch_size: int, max_persons: int = None,
                 shuffle: bool = True, repeat: bool = True,
                 num_workers: int = 0, prefetch: int = 2, seed: int = 0,
                 mesh=None, worker_timeout: float = 300.0):
        self.dataset = dataset
        self.batch_size = batch_size
        if max_persons is None:
            # derive from the dataset's config: the dataset masks out
            # persons beyond ITS max_persons, so a mismatched loader cap
            # would silently truncate GT without the mask protection
            max_persons = getattr(getattr(dataset, "cfg", None),
                                  "max_persons", 16)
        self.max_persons = max_persons
        self.shuffle = shuffle
        self.repeat = repeat
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.mesh = mesh
        self.worker_timeout = worker_timeout
        self._rng = np.random.RandomState(seed)
        self._pool = None
        if num_workers > 0:
            import multiprocessing as mp

            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                num_workers, initializer=_worker_init,
                initargs=(dataset, seed, ctx.Value("i", 0)))

    def _index_stream(self) -> Iterator[int]:
        n = len(self.dataset)
        while True:
            order = (self._rng.permutation(n) if self.shuffle
                     else np.arange(n))
            yield from order
            if not self.repeat:
                return

    def _assemble(self, samples):
        # local import: tpupose.train.trainer imports tpupose.data.gt,
        # so a module-level import here would be circular
        from tpupose.train.trainer import TrainBatch, pad_poses

        imgs = np.stack([s[0] for s in samples])
        # keypoint count rides the samples' (P, K, 3) tables: 18 for the
        # pose dataset, 70/21 for single-branch crop datasets
        poses = pad_poses([s[1] for s in samples], self.max_persons,
                          num_keypoints=np.shape(samples[0][1])[1])
        masks = np.stack([s[2] for s in samples])
        arrays = {"imgs": imgs, "poses": poses, "ignore_mask": masks}
        if self.mesh is not None:
            from tpupose.parallel import shard_batch

            arrays = shard_batch(arrays, self.mesh)
        return TrainBatch(**arrays)

    def _sample_stream(self):
        idx = self._index_stream()
        if self._pool is not None:
            # Windowed dispatch instead of Pool.imap: imap's feeder thread
            # consumes the (infinite) index stream without backpressure and
            # buffers every decoded sample, growing host memory without
            # bound whenever workers outpace the training step.  A bounded
            # deque of in-flight AsyncResults caps that at window size.
            import collections

            window = max(2 * self.num_workers,
                         self.prefetch * self.batch_size)
            inflight = collections.deque()
            exhausted = False
            while True:
                while not exhausted and len(inflight) < window:
                    try:
                        i = next(idx)
                    except StopIteration:
                        exhausted = True
                        break
                    inflight.append(
                        self._pool.apply_async(_worker_sample, (i,)))
                if not inflight:
                    return
                # Timeout guards against HARD worker deaths (segfault /
                # OOM-kill): apply_async results of a dead worker never
                # complete, unlike Python exceptions (which propagate via
                # _worker_sample) — without it training would hang forever.
                try:
                    s = inflight.popleft().get(timeout=self.worker_timeout)
                except multiprocessing.TimeoutError:
                    raise RuntimeError(
                        f"data worker produced no sample within "
                        f"{self.worker_timeout}s — a worker process likely "
                        "died hard (segfault/OOM-kill); restart with fewer "
                        "workers or a larger worker_timeout")
                if s is not None:
                    yield s
        else:
            for i in idx:
                s = _try_sample(self.dataset, i)
                if s is not None:
                    yield s

    def __iter__(self) -> Iterator[TrainBatch]:
        out: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def feeder():
            try:
                buf = []
                for s in self._sample_stream():
                    buf.append(s)
                    if len(buf) == self.batch_size:
                        out.put(self._assemble(buf))
                        buf = []
                if buf and not self.repeat:
                    if self.mesh is not None and (
                            len(buf) % self.mesh.devices.shape[0] != 0):
                        # a partial batch that doesn't divide the data
                        # axis can't be sharded; drop it rather than crash
                        print(f"[loader] dropping final partial batch of "
                              f"{len(buf)} (not divisible by data axis)",
                              flush=True)
                    else:
                        out.put(self._assemble(buf))
            except BaseException as e:  # noqa: BLE001
                # surface feeder failures to the consumer — swallowing
                # them would make an infinite training loader terminate
                # "successfully" mid-run
                out.put(e)
            finally:
                out.put(stop)

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        while True:
            item = out.get()
            if item is stop:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None
