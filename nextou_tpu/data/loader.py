"""Prefetching patch loader.

Host-side sampling + augmentation run in background threads, producing
channels-last batches ready for ``device_put`` — the stand-in for nnU-Net's
batchgenerators multi-process augmentation workers (SURVEY.md §2.4). Threads
(not processes) because the heavy lifting is NumPy/SciPy releasing the GIL,
and device compute overlaps the host work anyway.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from nextou_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    cascade_onehot_noise,
)
from nextou_tpu.data.sampler import PatchSampler


class PatchDataLoader:
    """Iterator of {'data': (B, *sp, C) f32, 'seg': (B, *sp) i32} batches.

    For cascade configurations pass ``onehot_labels`` (the foreground label
    values): the previous-stage seg patch is one-hot encoded over those
    labels, perturbed with :func:`cascade_onehot_noise` (training only), and
    appended to the data channels — nnU-Net's MoveSegAsOneHotToData."""

    def __init__(
        self,
        sampler: PatchSampler,
        augment: AugmentConfig | None = None,
        seed: int = 0,
        num_threads: int = 2,
        prefetch: int = 4,
        onehot_labels: tuple[int, ...] | None = None,
        cascade_noise: bool = False,
    ):
        self.sampler = sampler
        self.augment = augment
        self.onehot_labels = tuple(onehot_labels) if onehot_labels else None
        self.cascade_noise = cascade_noise
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self._rngs = [
            np.random.default_rng(seed + 1000 * i) for i in range(self.num_threads)
        ]
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._errors: list[BaseException] = []

    def _produce(self, tid: int):
        try:
            self._produce_loop(tid)
        except BaseException as e:  # noqa: BLE001 — surfaced by __next__
            self._errors.append(e)

    def _produce_loop(self, tid: int):
        rng = self._rngs[tid]
        while not self._stop.is_set():
            # per-thread RNG stream: sampling runs lock-free (the sampler's
            # case cache has its own insert lock); previously a single shared
            # RNG behind this loader's lock serialized the producer threads
            data, seg, prev = self.sampler.sample_batch(rng=rng)
            if self.augment is not None:
                data, seg, prev = augment_batch(
                    data, seg, self.augment, rng, prev
                )
            if prev is not None:
                if self.onehot_labels is None:
                    raise ValueError(
                        "cascade dataset (seg_prev present) needs "
                        "onehot_labels on the PatchDataLoader"
                    )
                hot = np.stack(
                    [(prev == l) for l in self.onehot_labels], axis=1
                ).astype(np.float32)  # (B, F, *sp)
                if self.cascade_noise:
                    for b in range(hot.shape[0]):
                        hot[b] = cascade_onehot_noise(hot[b], rng)
                data = np.concatenate([data, hot], axis=1)
            batch = {
                # (B, C, *sp) -> channels-last
                "data": np.ascontiguousarray(np.moveaxis(data, 1, -1)),
                "seg": seg.astype(np.int32),
            }
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def start(self):
        if self._threads:
            return self
        for i in range(self.num_threads):
            t = threading.Thread(target=self._produce, args=(i,), daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        self._threads = []

    def __iter__(self):
        self.start()
        return self

    def __next__(self):
        # a producer that died (corrupt case, missing prev-stage file) must
        # surface its exception promptly — checked BEFORE serving the next
        # batch (a surviving second thread can keep the queue non-empty
        # forever, which would bury the error), and polled with a timeout
        # instead of blocking forever on an empty queue.
        while True:
            if self._errors:
                self._stop.set()
                raise RuntimeError(
                    "PatchDataLoader producer thread failed"
                ) from self._errors[0]
            try:
                return self._q.get(timeout=1.0)
            except queue.Empty:
                if self._threads and not any(
                    t.is_alive() for t in self._threads
                ):
                    raise RuntimeError(
                        "all PatchDataLoader producer threads exited"
                    )

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
