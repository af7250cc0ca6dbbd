"""Multi-stream batched serving engine.

The reference's deployment story is one `ActionRecognition` per camera
(infer/inference.py:47-113) — one tiny forward per stream per tick. On
TPU that shape is the worst case: each dispatch pays the ~1.4 ms program
floor and a batch-1 forward leaves the MXU almost idle, while the same
model at batch 64+ runs two orders of magnitude more sequences per
second (PERF.md serving table). This engine is the TPU-idiomatic
formulation of the same capability: N independent skeleton streams are
multiplexed into ONE fixed-shape jitted forward per tick.

Design rules:
- the batch dimension is STATIC (`max_streams` x `multi_test` crops):
  one compiled program regardless of how many streams are live; empty
  slots are zero-padded and their outputs discarded.
- per-stream state (ring buffer, smoothing, energy-based skeleton
  selection, normalization) stays on the host in numpy, exactly like the
  single-stream recognizer — the device only ever sees the batched
  tensor.
- per-stream semantics (multi-crop averaging, class filtering, softmax)
  match `ActionRecognition.predict` bit-for-bit; a batched tick over K
  live streams returns the same answers as K single-stream predicts.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agcn_tpu.data.sgn_collate import SegmentSampler
from agcn_tpu.infer.preprocess import InferencePreprocessor
from agcn_tpu.infer.realtime import filter_logits


class BatchedStreamServer:
    """Serve many skeleton streams with one padded batched forward."""

    def __init__(self,
                 model,
                 variables,
                 max_streams: int,
                 kind: str = "dense",           # 'dense' | 'sgn'
                 num_joint: int = 25,
                 max_seq_length: int = 300,
                 max_person: int = 4,
                 moving_avg: int = 1,
                 num_skels: int = 2,
                 normalize: bool = True,
                 multi_test: int = 1,
                 allowed_classes: Optional[Sequence[int]] = None,
                 sgn_dataloader_args: Optional[Dict] = None):
        if max_streams < 1:
            raise ValueError("max_streams must be >= 1")
        self.kind = kind
        self.max_streams = max_streams
        self.num_skels = num_skels
        self.normalize = normalize
        self.multi_test = multi_test
        self.allowed_classes = allowed_classes
        self._pp_kwargs = dict(num_joint=num_joint,
                               max_seq_length=max_seq_length,
                               max_person=max_person,
                               moving_avg=moving_avg)
        self._sgn_args = dict(sgn_dataloader_args or {})
        # the recipe's test_dataloader_args carry multi_test too — the
        # explicit parameter wins (passing both would crash SegmentSampler)
        self._sgn_args.pop("multi_test", None)
        self.variables = variables
        self._forward = jax.jit(
            lambda v, x: model.apply(v, x, train=False))
        self._streams: Dict[int, InferencePreprocessor] = {}
        self._rngs: Dict[int, np.random.Generator] = {}
        self._next_id = 0
        # ping-pong batch buffers: the async pipeline keeps one tick in
        # flight, and on CPU backends jnp.asarray may alias host memory —
        # the buffer being filled must never be the one the in-flight
        # program reads
        self._xbufs = [None, None]
        self._xbuf_i = 0
        self._pool = None  # lazy thread pool for host preprocessing
        self._pending = None  # in-flight (sids, per, out) for async mode
        self.last_latency_ms = 0.0
        self.last_prep_ms = 0.0
        self.last_h2d_ms = 0.0

    # -- stream lifecycle --------------------------------------------

    def add_stream(self, stream_id: Optional[int] = None) -> int:
        if len(self._streams) >= self.max_streams:
            raise RuntimeError(
                f"server at capacity ({self.max_streams} streams)")
        sid = self._next_id if stream_id is None else stream_id
        if sid in self._streams:
            raise ValueError(f"stream {sid} already exists")
        self._next_id = max(self._next_id, sid) + 1
        sampler = None
        if self.kind == "sgn":
            sampler = SegmentSampler(multi_test=self.multi_test,
                                     **self._sgn_args)
        self._streams[sid] = InferencePreprocessor(
            sgn_sampler=sampler, **self._pp_kwargs)
        # per-stream RNG stream: deterministic and independent of the
        # set of other live streams (same rule as the data pipeline)
        self._rngs[sid] = np.random.default_rng(sid)
        return sid

    def remove_stream(self, stream_id: int) -> None:
        self._streams.pop(stream_id)
        self._rngs.pop(stream_id)

    def append_frame(self, stream_id: int, frame: np.ndarray) -> None:
        """frame: (M, 1, V, C) joints for the stream's current step."""
        self._streams[stream_id].append(frame)

    # -- inference ----------------------------------------------------

    def _stream_input(self, sid: int) -> np.ndarray:
        pp = self._streams[sid]
        if self.kind == "sgn":
            return pp.sgn_input(self.num_skels, normalize=self.normalize,
                                multi_crop=self.multi_test > 1,
                                rng=self._rngs[sid])
        return pp.dense_input(self.num_skels, normalize=self.normalize)

    def _prepare_dense_batched(self, sids):
        """Vectorized dense prep: ONE pass over all streams.

        The per-stream path spends ~1.2 ms/stream in 4x(sum+3xstd)
        small-array numpy calls per body (energy selection) that the
        thread pool cannot parallelize (call overhead, GIL); stacking
        the ring buffers and doing masked-moment energy + top-k
        selection + layout (+ batched pre_normalization) as whole-batch
        ops is ~10x cheaper at 64 streams. Energies use fp64
        accumulators — ordering agrees with the per-stream fp32 std
        except for exact ties, where either body is equally valid.
        """
        pps = [self._streams[sid] for sid in sids]
        data = np.stack([pp.data for pp in pps])  # (S, M, T, V, C)
        v = data.shape[3]
        mask = (data.sum((-1, -2)) != 0)  # (S, M, T) valid frames
        w = mask[..., None, None]
        # f32 pairwise sums (numpy's default reduction tree over the
        # ~1600-element T*V windows), moments finished in f64 — a pure
        # f64 accumulation pass costs ~4x here for no ordering benefit
        cnt = mask.sum(-1)[..., None].astype(np.float64) * v  # (S, M, 1)
        dm = data * w
        s1 = dm.sum((2, 3)).astype(np.float64)   # (S, M, C)
        s2 = (dm * data).sum((2, 3)).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = s1 / cnt
            var = s2 / cnt - np.square(mean)
        std = np.sqrt(np.maximum(var, 0.0))
        energy = np.where(cnt[..., 0] > 0, std.sum(-1), 0.0)  # (S, M)
        order = np.argsort(energy, axis=1)[:, ::-1][:, :self.num_skels]
        sel = data[np.arange(len(sids))[:, None], order]  # (S, M', T, V, C)
        rows = np.ascontiguousarray(
            np.transpose(sel, (0, 4, 2, 3, 1)))  # (S, C, T, V, M')
        if self.normalize:
            from agcn_tpu.data.gen.preprocess import pre_normalization

            rows = pre_normalization(rows, zaxis=pps[0].zaxis,
                                     xaxis=pps[0].xaxis)
        return rows.astype(np.float32)

    def _prepare(self):
        """Host phase: per-stream preprocessing + static-shape padding.
        Returns (sids, per, device_input) or None when no streams."""
        t0 = time.perf_counter()
        sids = sorted(self._streams)
        if not sids:
            return None
        if self.kind == "dense" and len(sids) > 4:
            rows = self._prepare_dense_batched(sids)
            per = 1
            shape = (self.max_streams,) + rows.shape[1:]
            self._xbuf_i ^= 1
            if self._xbufs[self._xbuf_i] is None or \
                    self._xbufs[self._xbuf_i].shape != shape:
                self._xbufs[self._xbuf_i] = np.zeros(shape, rows.dtype)
            x = self._xbufs[self._xbuf_i]
            x[:len(sids)] = rows
            t1 = time.perf_counter()
            xd = jnp.asarray(x)
            self.last_h2d_ms = (time.perf_counter() - t1) * 1e3
            self.last_prep_ms = (time.perf_counter() - t0) * 1e3
            return sids, per, xd
        # row 0 serially: it fixes the per-stream row shape so the
        # batch buffer can be preallocated ONCE and every worker writes
        # its slice in place (per-stream tasks + a 64-array concatenate
        # cost ~0.6 ms/stream of pure overhead at 64 streams)
        row0 = self._stream_input(sids[0])
        per = row0.shape[0]  # crops per stream (1 for dense)
        shape = (self.max_streams * per,) + row0.shape[1:]
        self._xbuf_i ^= 1
        if self._xbufs[self._xbuf_i] is None or                 self._xbufs[self._xbuf_i].shape != shape:
            # zero so pad slots start defined; stale rows from removed
            # streams are harmless — eval has no cross-row coupling and
            # _finalize discards everything past len(sids)*per
            self._xbufs[self._xbuf_i] = np.zeros(shape, row0.dtype)
        x = self._xbufs[self._xbuf_i]
        x[:per] = row0
        rest = sids[1:]
        if len(rest) > 4:
            # chunked fan-out: W slab tasks, not one per stream (numpy
            # releases the GIL; each stream's state is touched by
            # exactly one task; slices are disjoint)
            if self._pool is None:
                import concurrent.futures as cf
                self._pool = cf.ThreadPoolExecutor(
                    max_workers=min(8, self.max_streams))
            workers = min(8, len(rest))

            def slab(w):
                for j in range(1 + w, len(sids), workers):
                    x[j * per:(j + 1) * per] = self._stream_input(sids[j])

            list(self._pool.map(slab, range(workers)))
        else:
            for j, sid in enumerate(rest, start=1):
                x[j * per:(j + 1) * per] = self._stream_input(sid)
        t1 = time.perf_counter()
        xd = jnp.asarray(x)
        # split out the host->device transfer: on a tunneled device it
        # dominates "prep" while pure host work stays sub-ms/stream
        self.last_h2d_ms = (time.perf_counter() - t1) * 1e3
        self.last_prep_ms = (time.perf_counter() - t0) * 1e3
        return sids, per, xd

    def _finalize(self, sids, per, out
                  ) -> Dict[int, Tuple[int, np.ndarray]]:
        """Host phase: materialize device logits -> per-stream answers."""
        logits = np.asarray(out[0] if isinstance(out, tuple) else out)
        logits = logits[: len(sids) * per]
        if per > 1:  # multi-crop averaging (reference processor.py:546-548)
            logits = logits.reshape(len(sids), per, -1).mean(axis=1)
        results: Dict[int, Tuple[int, np.ndarray]] = {}
        for i, sid in enumerate(sids):
            li = filter_logits(logits[i], self.allowed_classes)
            probs = np.exp(li - li.max())
            probs = probs / probs.sum()
            results[sid] = (int(probs.argmax()), probs)
        return results

    def predict(self) -> Dict[int, Tuple[int, np.ndarray]]:
        """One batched forward over all live streams ->
        {stream_id: (label, probabilities)}. Not interleavable with an
        in-flight predict_async() tick — drain with flush() first, or
        the pipelined results would silently go stale/misordered."""
        if self._pending is not None:
            raise RuntimeError(
                "a pipelined tick is in flight: call flush() before "
                "mixing predict() with predict_async()")
        t0 = time.perf_counter()
        prepped = self._prepare()
        if prepped is None:
            return {}
        sids, per, x = prepped
        results = self._finalize(sids, per,
                                 self._forward(self.variables, x))
        self.last_latency_ms = (time.perf_counter() - t0) * 1e3
        return results

    def predict_async(self) -> Optional[Dict[int, Tuple[int, np.ndarray]]]:
        """Pipelined tick: prep + DISPATCH this tick, return the
        PREVIOUS tick's results (None before the first completes).

        jax dispatch is asynchronous, so the device computes tick t
        while the caller appends frames and this method preps tick t+1
        on the host — the two phases that otherwise serialize in
        predict(). Same per-tick answers as predict(), shifted by one
        tick of latency; call flush() to drain the last tick. Streams
        may be added/removed between ticks (each tick's results carry
        its own stream ids)."""
        t0 = time.perf_counter()
        prepped = self._prepare()
        pending, self._pending = self._pending, None
        if prepped is not None:
            sids, per, x = prepped
            self._pending = (sids, per, self._forward(self.variables, x))
        results = self._finalize(*pending) if pending else None
        self.last_latency_ms = (time.perf_counter() - t0) * 1e3
        return results

    def flush(self) -> Optional[Dict[int, Tuple[int, np.ndarray]]]:
        """Drain the in-flight pipelined tick (predict_async)."""
        pending, self._pending = self._pending, None
        return self._finalize(*pending) if pending else None
