"""Quantized inference serving: tensor-sharded weights + continuous
batching across a device mesh.

No reference analogue (the reference stops at fake-quant eval loops);
this is the BASELINE.json north-star serving path: int8 weights sharded
over the mesh 'model' axis (output channels), requests continuously
batched into fixed-shape device steps, psum/all-gather inserted by XLA
SPMD and riding ICI.

Multi-host: one engine per host process (`jax.distributed.initialize`
outside), each host feeds its local request stream; the mesh spans all
hosts so every forward is a collective — scaling is measured by
:func:`measure_throughput` at 1-chip / n-chip meshes.

Multi-host lockstep protocol (``lockstep=True``, auto when
``jax.process_count() > 1``): a collective forward requires every host
to dispatch the *same sequence* of steps — batching on local queue
timing would desync hosts and deadlock the collective.  The dispatcher
therefore steps **unconditionally** on a fixed tick: each step drains at
most one device batch from the local queue (an empty queue pads a
zero batch) and always runs the forward.  Host k's Nth forward pairs
with every other host's Nth forward by construction; wall-clock skew
only adds backpressure, never deadlock.  Shutdown is consensus-based at
deterministic step indices: every ``consensus_every`` steps all hosts
allgather a local ``want_stop`` flag (set by :meth:`stop` once the local
queue is drained) and exit together when it is unanimous — so the total
step count is identical on every host.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlmc_quant_tpu.parallel.sharding_rules import shard_params


class InferenceEngine:
    """Continuous-batching engine over a jitted, mesh-sharded forward.

    Requests (single images or micro-batches) are queued; a dispatcher
    thread packs them into fixed-size batches (padding the tail), runs
    the sharded forward, and resolves per-request futures.
    """

    def __init__(self, model, variables, mesh: Optional[Mesh] = None,
                 batch_size: int = 64, qmode: str = "int",
                 max_wait_ms: float = 2.0, data_axis: str = "data",
                 model_axis: str = "model", lockstep: Optional[bool] = None,
                 tick_ms: float = 5.0, consensus_every: int = 8,
                 weight_resident: bool = True):
        self.model = model
        self.mesh = mesh
        self.batch_size = batch_size
        self.qmode = qmode
        self.max_wait = max_wait_ms / 1e3
        self.lockstep = (jax.process_count() > 1 if lockstep is None
                         else bool(lockstep))
        self.tick = tick_ms / 1e3
        self.consensus_every = max(int(consensus_every), 1)
        self.steps = 0                  # lockstep: local dispatch count
        self._image_shape = None        # set by warmup()

        if mesh is not None and model_axis in mesh.axis_names:
            variables = shard_params(variables, mesh, model_axis)
            self._in_sharding = NamedSharding(
                mesh, P(data_axis if data_axis in mesh.axis_names else None,
                        None, None, None))
        else:
            self._in_sharding = None
        self.variables = variables

        # Weight-resident dispatch (default): variables are serving-time
        # constants, so they are captured in the jitted program rather
        # than passed per call — per-call pytree marshalling costs ~7 ms
        # on the axon tunnel (see quant/deploy.py:make_serving_fn).
        # NOTE the variables are *frozen into the program* at
        # construction: later mutation of ``engine.variables`` is
        # ignored.  Pass ``weight_resident=False`` for the arg-passed
        # form — faster for fp32 weights on the tunnel (the captured
        # form re-stages large fp32 constants per call: measured 30k vs
        # 40k img/s) and required for models whose captured constants
        # exceed ~100 MB (remote-compile request limit).
        if weight_resident:
            captured = self.variables
            self._fwd = jax.jit(
                lambda x: self.model.apply(captured, x, qmode=self.qmode))
        else:
            fwd = jax.jit(
                lambda v, x: self.model.apply(v, x, qmode=self.qmode))
            self._fwd = lambda x: fwd(self.variables, x)
        self._queue: "queue.Queue" = queue.Queue()
        self._carry = None          # request deferred to the next batch
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats = {"batches": 0, "images": 0, "pad_waste": 0}

    # -- synchronous API ---------------------------------------------------

    def forward(self, x):
        """Direct fixed-batch forward (pads/truncates to batch_size)."""
        n = x.shape[0]
        if n < self.batch_size:
            x = np.concatenate(
                [x, np.zeros((self.batch_size - n,) + x.shape[1:],
                             x.dtype)])
        x = jnp.asarray(x)
        if self._in_sharding is not None:
            x = jax.device_put(x, self._in_sharding)
        return self._fwd(x)[:n]

    def warmup(self, image_shape):
        self._image_shape = tuple(image_shape)
        x = np.zeros((self.batch_size,) + tuple(image_shape), np.float32)
        np.asarray(self.forward(x))

    # -- continuous batching ----------------------------------------------

    def start(self):
        if self.lockstep and self._image_shape is None:
            raise RuntimeError(
                "lockstep engines must warmup(image_shape) before start():"
                " empty steps need the padded batch shape")
        self._stop.clear()
        target = self._lockstep_loop if self.lockstep else self._loop
        self._thread = threading.Thread(target=target, daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 60):
        """Signal shutdown.  Lockstep mode keeps stepping until every
        host's queue is drained and the stop consensus is unanimous, so
        the step count matches across hosts."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=timeout)

    def submit(self, images: np.ndarray) -> Future:
        """Enqueue a request (K,H,W,C); future resolves to (K, classes).

        Requests larger than the device batch are split into chunks and
        re-assembled before the future resolves."""
        images = np.asarray(images)
        if images.shape[0] <= self.batch_size:
            fut: Future = Future()
            self._queue.put((images, fut))
            return fut
        chunks = [images[i:i + self.batch_size]
                  for i in range(0, images.shape[0], self.batch_size)]
        parts = [Future() for _ in chunks]
        for c, f in zip(chunks, parts):
            self._queue.put((c, f))
        out: Future = Future()

        def _gather():
            try:
                out.set_result(np.concatenate([f.result() for f in parts]))
            except Exception as e:
                out.set_exception(e)

        threading.Thread(target=_gather, daemon=True).start()
        return out

    def _loop(self):
        while not self._stop.is_set():
            batch, futs, sizes = [], [], []
            total = 0
            deadline = None
            while total < self.batch_size:
                if self._carry is not None:
                    imgs, fut = self._carry
                    self._carry = None
                else:
                    timeout = (self.max_wait if deadline is None
                               else max(deadline - time.perf_counter(), 0))
                    try:
                        imgs, fut = self._queue.get(timeout=timeout)
                    except queue.Empty:
                        break
                if total + len(imgs) > self.batch_size:
                    # would overflow the fixed device batch: defer whole
                    # request to the next step (keeps per-future results
                    # complete)
                    self._carry = (imgs, fut)
                    break
                if deadline is None:
                    deadline = time.perf_counter() + self.max_wait
                batch.append(imgs)
                futs.append(fut)
                sizes.append(len(imgs))
                total += len(imgs)
            if not batch:
                continue
            x = np.concatenate(batch)
            n = x.shape[0]
            try:
                out = np.asarray(self.forward(x))
            except Exception as e:  # resolve futures with the error
                for f in futs:
                    f.set_exception(e)
                continue
            self.stats["batches"] += 1
            self.stats["images"] += n
            self.stats["pad_waste"] += self.batch_size - n
            off = 0
            for f, k in zip(futs, sizes):
                f.set_result(out[off:off + k])
                off += k

    # -- lockstep dispatcher (multi-host collective-safe) -------------------

    def _collect_until(self, deadline: float):
        """Drain up to one device batch from the local queue, never
        blocking past ``deadline``.  Returns (arrays, futures, sizes)."""
        batch, futs, sizes = [], [], []
        total = 0
        while total < self.batch_size:
            if self._carry is not None:
                imgs, fut = self._carry
                self._carry = None
            else:
                timeout = deadline - time.perf_counter()
                try:
                    # behind schedule (slow forward): still drain
                    # whatever is already queued, without blocking
                    imgs, fut = (self._queue.get_nowait() if timeout <= 0
                                 else self._queue.get(timeout=timeout))
                except queue.Empty:
                    break
            if total + len(imgs) > self.batch_size:
                self._carry = (imgs, fut)
                break
            batch.append(imgs)
            futs.append(fut)
            sizes.append(len(imgs))
            total += len(imgs)
        return batch, futs, sizes

    def _lockstep_loop(self):
        """Fixed-cadence stepping: see the module docstring protocol.
        Every host executes the same number of collective forwards."""
        from jax.experimental import multihost_utils

        next_tick = time.perf_counter()
        while True:
            next_tick += self.tick
            batch, futs, sizes = self._collect_until(next_tick)
            n = sum(sizes)
            if n:
                x = np.concatenate(batch)
            else:   # empty step: the collective must still run
                x = np.zeros((self.batch_size,) + self._image_shape,
                             np.float32)
            try:
                out = np.asarray(self.forward(x))
                err = None
            except Exception as e:   # noqa: BLE001 — surfaced via futures
                out, err = None, e
            self.steps += 1
            self.stats["batches"] += 1
            self.stats["images"] += n
            self.stats["pad_waste"] += self.batch_size - n
            off = 0
            for f, k in zip(futs, sizes):
                if err is None:
                    f.set_result(out[off:off + k])
                else:
                    f.set_exception(err)
                off += k
            # consensus shutdown at deterministic step indices
            if self.steps % self.consensus_every == 0:
                want = (self._stop.is_set() and self._queue.empty()
                        and self._carry is None)
                votes = multihost_utils.process_allgather(
                    np.asarray([want]))
                if bool(np.all(votes)):
                    return
            now = time.perf_counter()
            if next_tick > now:
                time.sleep(next_tick - now)
            else:       # cadence slipped (slow step): don't accumulate lag
                next_tick = now


def measure_throughput(engine: InferenceEngine, image_shape,
                       n_batches: int = 20) -> float:
    """images/sec through the engine's fixed-batch forward (the scaling
    measurement for 1-chip vs n-chip meshes)."""
    x = np.random.default_rng(0).random(
        (engine.batch_size,) + tuple(image_shape), np.float32)
    engine.warmup(image_shape)
    t0 = time.perf_counter()
    out = None
    for _ in range(n_batches):
        out = engine.forward(x)
    float(jnp.sum(out))  # fence
    dt = time.perf_counter() - t0
    return engine.batch_size * n_batches / dt
