"""Batching pipeline.

Reference parity: torch ``DataLoader(workers=N)`` feeding the epoch loop.
TPU-native equivalent: a deterministic host-side loader with per-host
sharding (each JAX process loads only its shard of every global batch —
the Grain pattern), producing fixed-shape numpy pytrees ready for
``jax.device_put`` with a batch sharding.

``BatchLoader`` is dependency-free; ``grain_loader`` builds the same
pipeline on Google Grain (prefetch + worker processes) when available.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import numpy as np

# Env vars that make an interpreter register a TPU PJRT plugin at startup
# (e.g. a sitecustomize-driven tunnel). Data workers must never inherit
# them — see _data_worker_env. Override with HOCON_WORKER_STRIP_ENV
# (comma-separated) if the deployment uses different hook variables.
_WORKER_STRIP_ENV = tuple(
    v
    for v in os.environ.get(
        "HOCON_WORKER_STRIP_ENV", "PALLAS_AXON_POOL_IPS"
    ).split(",")
    if v
)


@contextlib.contextmanager
def _data_worker_env():
    """Pin data-loader worker processes to CPU-only JAX.

    Grain workers run the dataset ``__getitem__`` (decode/crop/augment) —
    pure host work. Importing ``hocon`` inside a worker imports jax, and a
    worker that inherits the parent's accelerator env would (a) race the
    training process for the device (single-chip TPU access is exclusive)
    and (b) hang at interpreter start whenever a sitecustomize-registered
    PJRT plugin's control plane is unreachable (observed: registration
    retries in a sleep loop). Children snapshot ``os.environ`` at spawn,
    so setting it around worker startup is sufficient; the parent's
    already-latched jax config is unaffected and the env is restored.
    """
    keys = ("JAX_PLATFORMS", *_WORKER_STRIP_ENV)
    saved = {k: os.environ.get(k) for k in keys}
    os.environ["JAX_PLATFORMS"] = "cpu"
    for k in _WORKER_STRIP_ENV:
        os.environ.pop(k, None)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

try:
    import jax

    _TREE_STACK = lambda samples: jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *samples
    )
except Exception:  # pragma: no cover
    _TREE_STACK = None


class _Prefetcher:
    """Iterator wrapper that assembles up to ``depth`` items ahead in a
    background thread. Device dispatch is async in JAX, so while the chip
    executes step N the thread builds batch N+1 (numpy work releases the
    GIL in practice); exceptions propagate to the consumer.

    The producer NEVER blocks indefinitely: every put is stop-aware, and
    abandoning the iterator (``break`` mid-epoch, or dropping the iterator
    after a single ``next``) triggers ``close()`` via the generator's
    ``finally`` when it is closed/collected, so the thread and its queued
    batches are released instead of leaking once per epoch."""

    _DONE = object()

    def __init__(self, make_iter, depth: int):
        import queue
        import threading

        self._queue_mod = queue
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def put(item) -> bool:
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def run():
            try:
                for item in make_iter():
                    if not put(item):
                        return
            except BaseException as e:  # propagate, don't hang the consumer
                put(e)
            else:
                put(self._DONE)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def close(self):
        self._stop.set()
        # Drop pinned batches so the producer's pending put unblocks fast.
        try:
            while True:
                self._q.get_nowait()
        except self._queue_mod.Empty:
            pass

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is self._DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            self.close()


def probe_batch(dataset, local_batch: int) -> dict:
    """Assemble one local batch directly from the dataset, for shape
    probing and TrainState init.

    Deliberately NOT ``next(iter(train_loader))``: GrainEpochLoader shares
    one infinite iterator across epochs, so pulling a probe batch from it
    would permanently consume batch 0 — epoch 0 then trains on batches
    1..N and every later epoch is misaligned by one against Grain's
    per-epoch shuffle boundaries (silently different from --workers 0).
    """
    samples = [dataset[i % len(dataset)] for i in range(local_batch)]
    batch = _TREE_STACK(samples)
    if isinstance(batch, dict):
        batch["_valid"] = np.ones(local_batch, np.float32)
    return batch


class BatchLoader:
    """Deterministic shuffling batch loader with per-host sharding.

    Args:
      dataset: indexable dataset returning (possibly nested) dict samples.
      batch_size: GLOBAL batch size; each host yields batch_size/shard_count.
      shard_index / shard_count: this host's shard (jax.process_index/count).
      prefetch: assemble up to N batches ahead in a background thread
        (0 = synchronous). Sample order and contents are identical either
        way — prefetch only moves the host work off the consumer's critical
        path.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        shard_index: int = 0,
        shard_count: int = 1,
        prefetch: int = 0,
    ):
        if batch_size % shard_count:
            raise ValueError("global batch size must divide by shard count")
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = batch_size // shard_count
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.prefetch = prefetch

    def epoch_indices(self, epoch: int) -> tuple[np.ndarray, np.ndarray]:
        """Returns (indices, valid) of shape (n_batches, local_batch);
        valid is 0 for wrap-around padding rows (drop_last=False tail)."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            rng.shuffle(idx)
        valid = np.ones(len(idx), np.float32)
        n_batches = len(idx) // self.batch_size
        if not self.drop_last and len(idx) % self.batch_size:
            pad = self.batch_size - len(idx) % self.batch_size
            # np.resize tiles: pad can exceed len(idx) (dataset smaller
            # than one global batch) and must still fill a whole batch.
            idx = np.concatenate([idx, np.resize(idx, pad)])
            valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            n_batches += 1
        shape = (n_batches, self.shard_count, self.local_batch)
        n = n_batches * self.batch_size
        return (
            idx[:n].reshape(shape)[:, self.shard_index],
            valid[:n].reshape(shape)[:, self.shard_index],
        )

    def steps_per_epoch(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        if self.prefetch > 0:
            return iter(_Prefetcher(lambda: self._epoch(epoch), self.prefetch))
        return self._epoch(epoch)

    def _epoch(self, epoch: int) -> Iterator[dict]:
        indices, valids = self.epoch_indices(epoch)
        for batch_idx, batch_valid in zip(indices, valids):
            samples = [self.dataset[int(i)] for i in batch_idx]
            batch = _TREE_STACK(samples)
            if isinstance(batch, dict):
                batch["_valid"] = batch_valid
            yield batch

    def __iter__(self):
        return self.epoch(0)


class GrainEpochLoader:
    """Epoch-API adapter over a Grain DataLoader with worker processes.

    Reference parity: torch ``DataLoader(workers=N)``. Grain runs the
    dataset __getitem__ (decode/crop/augment) in ``worker_count`` child
    processes and prefetches; this adapter slices the resulting infinite
    stream into epochs so it is drop-in for ``BatchLoader`` in the train
    loop (train only — eval needs the tail-validity masks of BatchLoader).

    ``train_only`` is enforced by ``hocon.train.loop.epoch_pass``: feeding
    this loader to an eval pass would silently drop the dataset tail
    (``drop_remainder=True``, no ``_valid`` masks) and bias the metrics.

    Note: with ``worker_count > 0`` Grain stripes records across workers
    and batches per worker stream, so batch COMPOSITION differs from
    ``worker_count == 0`` (every sample still appears exactly once per
    epoch — tested). Fine for shuffled training; exactly why eval uses
    ``GrainEvalLoader`` instead.
    """

    train_only = True

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
        worker_count: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = batch_size // shard_count
        self._steps = len(dataset) // batch_size
        self._loader = grain_loader(
            dataset, batch_size, shuffle=shuffle, seed=seed,
            shard_index=shard_index, shard_count=shard_count,
            worker_count=worker_count, num_epochs=None,
        )
        self._it = None

    def steps_per_epoch(self) -> int:
        return self._steps

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        if self._it is None:
            self._it = iter(self._loader)
        for _ in range(self._steps):
            yield next(self._it)

    def __iter__(self):
        return self.epoch(0)


class GrainEvalLoader:
    """Multi-worker EVAL loader with exactly-once-per-sample semantics.

    Reference parity: the reference evaluates with ``DataLoader(workers=8)``
    too (SURVEY §2.1 epoch-loop row); ``GrainEpochLoader`` cannot serve
    eval because Grain's sampler drops the dataset tail and carries no
    validity masks. This loader instead reuses ``BatchLoader``'s index and
    wrap-around-padding math verbatim — the batch composition, ordering,
    and ``_valid`` masks are bit-identical to ``BatchLoader`` — and only
    moves the per-sample ``dataset[i]`` work (decode / crop / augment)
    into ``worker_count`` Grain child processes. Metrics from an eval
    pass therefore match ``--workers 0`` exactly (tested:
    test_data.py::test_grain_eval_loader_bitwise_parity).

    ``worker_count == 0`` falls back to the in-process BatchLoader.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        shard_index: int = 0,
        shard_count: int = 1,
        worker_count: int = 0,
    ):
        self._inner = BatchLoader(
            dataset, batch_size, shuffle=shuffle, seed=seed,
            drop_last=drop_last, shard_index=shard_index,
            shard_count=shard_count,
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = self._inner.local_batch
        self.worker_count = worker_count

    def steps_per_epoch(self) -> int:
        return self._inner.steps_per_epoch()

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        if self.worker_count <= 0:
            yield from self._inner.epoch(epoch)
            return
        import grain.python as grain

        indices, valids = self._inner.epoch_indices(epoch)
        dataset = self.dataset

        class _BatchSource:
            """source[b] = fully assembled batch b. One record per BATCH,
            map-only pipeline (no grain.Batch): Grain stripes records
            across workers and applies operations per worker stream, so a
            grain.Batch over sample records would group every W-th sample
            (observed: [0,2,4] with 2 workers). With batch-granular
            records the round-robin worker interleave reconstructs the
            sampler order exactly, and batch composition is decided solely
            by epoch_indices — identical to BatchLoader."""

            def __len__(self):
                return len(indices)

            def __getitem__(self, b):
                samples = [dataset[int(i)] for i in indices[b]]
                return _TREE_STACK(samples)

        sampler = grain.IndexSampler(
            num_records=len(indices),
            shard_options=grain.ShardOptions(
                shard_index=0, shard_count=1, drop_remainder=True
            ),
            shuffle=False,
            num_epochs=1,
            seed=0,
        )
        loader = grain.DataLoader(
            data_source=_BatchSource(),
            sampler=sampler,
            operations=[],
            worker_count=self.worker_count,
        )
        it = iter(_WorkerEnvLoader(loader))
        for batch_valid in valids:
            batch = next(it)
            if isinstance(batch, dict):
                batch["_valid"] = batch_valid
            yield batch
        # Drain the exhausted stream so Grain shuts its worker pool down
        # now (leaving it to GC leaks shared-memory segments until exit).
        for _ in it:
            pass

    def __iter__(self):
        return self.epoch(0)


def grain_loader(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
    worker_count: int = 0,
    num_epochs: Optional[int] = None,
):
    """Grain-backed pipeline (multiprocess prefetch) with the same semantics."""
    import grain.python as grain

    class _Source:
        def __len__(self):
            return len(dataset)

        def __getitem__(self, i):
            return dataset[i]

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.ShardOptions(
            shard_index=shard_index, shard_count=shard_count, drop_remainder=True
        ),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = grain.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[grain.Batch(batch_size // shard_count, drop_remainder=True)],
        worker_count=worker_count,
    )
    return _WorkerEnvLoader(loader) if worker_count else loader


class _WorkerEnvLoader:
    """Iterates a Grain DataLoader with worker spawns under _data_worker_env.

    Grain spawns worker processes when iteration is driven (first pull)
    and may respawn crashed workers on later pulls, so the env context is
    entered around EVERY ``next`` — not held across the whole (possibly
    infinite, ``num_epochs=None``) stream. Between pulls the parent env is
    fully restored: unrelated subprocesses the training run spawns mid-run
    (probes, eval dumps) see the real accelerator env instead of the
    CPU-pinned worker env. The mutation only matters to newly spawned
    children — the parent process latched its jax config long before.
    """

    def __init__(self, loader):
        self._loader = loader

    def __iter__(self):
        it = None
        while True:
            with _data_worker_env():
                if it is None:
                    it = iter(self._loader)
                try:
                    item = next(it)
                except StopIteration:
                    return
            yield item
