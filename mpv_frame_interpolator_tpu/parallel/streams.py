"""Multi-stream serving: K independent streams on one chip.

A transcode/serving farm interpolates many independent videos at once; a
single 4K stream uses a fraction of a v5e (bench: >16x real-time).  This
engine manages K streams' cadence + device state behind one lockstep API:

    ms = MultiStreamEngine(EngineConfig(...), n_streams=4)
    for step_frames in zip(*sources):          # one frame per stream
        outs = ms.push_batch(step_frames)      # {stream_id: [OutputFrame]}

Dispatch strategy (measured on v5e, 4x1080p 24->60):
  sequential fused steps   1158 total out-fps   <- default
  vmapped across streams    428 total out-fps   (batch_dispatch=True)
The vmap variant looked like the obvious win but measured 2.7x SLOWER: the
flow's gathers batch poorly under a leading vmap axis, and the fused
per-pair dispatch is already large enough to keep the chip busy.  The
vmapped path is kept behind `batch_dispatch=True` for future hardware
where batched gathers lower better.

Constraints: all streams share one geometry/pixfmt (farm batches by
format -- mixed formats go to separate engines); in batch_dispatch mode
per-step plans are padded to the widest stream's output count.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mpv_frame_interpolator_tpu.frame import FrameFormat, VideoFrame, split_chroma
from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry
from mpv_frame_interpolator_tpu.pipeline.cadence import CadenceEngine
from mpv_frame_interpolator_tpu.pipeline.engine import (
    EngineConfig, OutputFrame, _make_source_step)
from mpv_frame_interpolator_tpu.utils import get_logger

log = get_logger("streams")


@functools.lru_cache(maxsize=32)
def _make_batched_step(geom: FlowGeometry, mode: int, scale_shift: int,
                       cut_policy: str, scene_enabled: bool, model: str):
    """The engine's fused source-step vmapped over a leading stream axis."""
    base = _make_source_step(geom, mode, scale_shift, cut_policy,
                             scene_enabled, model)

    def one(f1y, f1u, f1v, f2y, f2u, f2v, ts, radius, ds, nbs, black,
            white, thr):
        return base(f1y, f1u, f1v, f2y, f2u, f2v, ts, radius, ds, nbs,
                    black, white, thr)

    return jax.jit(jax.vmap(
        one, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None, None, None,
                      None)))


class MultiStreamEngine:
    def __init__(self, config: Optional[EngineConfig] = None,
                 n_streams: int = 2, batch_dispatch: bool = False):
        self.config = config or EngineConfig()
        self.n = n_streams
        self.batch_dispatch = batch_dispatch
        self.cadences = [CadenceEngine(self.config.display_fps,
                                       self.config.playback_speed)
                         for _ in range(n_streams)]
        self.geom: Optional[FlowGeometry] = None
        self._fmt: Optional[FrameFormat] = None
        self._scale_shift = 0
        self._prev: List[Optional[VideoFrame]] = [None] * n_streams

    def _ensure_geometry(self, frame: VideoFrame):
        fmt = frame.fmt
        if self._fmt is None:
            self.geom = FlowGeometry.create(fmt.height, fmt.stride,
                                            fmt.width,
                                            self.config.max_calc_res,
                                            self.config.num_iterations)
            self._scale_shift = 0 if fmt.pixfmt == "nv12" else 8
            self._fmt = fmt
        elif (fmt.height, fmt.stride, fmt.width, fmt.pixfmt) != (
                self._fmt.height, self._fmt.stride, self._fmt.width,
                self._fmt.pixfmt):
            raise ValueError("all streams in a batch share one geometry; "
                             "route other formats to a separate engine")

    @staticmethod
    def _planes(frame: VideoFrame):
        u, v = split_chroma(frame.uv)
        return (jnp.asarray(frame.y), jnp.asarray(u), jnp.asarray(v))

    def push_batch(self, frames: Sequence[Optional[VideoFrame]]
                   ) -> Dict[int, List[OutputFrame]]:
        """One frame per stream (None = stream idle this step).  Returns
        {stream_index: [OutputFrame, ...]}."""
        assert len(frames) == self.n
        results: Dict[int, List[OutputFrame]] = {}
        plans = {}
        batch = []   # (stream_id, plan, f1 planes, f2 planes)

        for sid, frame in enumerate(frames):
            if frame is None:
                continue
            self._ensure_geometry(frame)
            plan = self.cadences[sid].on_source_frame(frame.pts,
                                                      frame.nominal_fps)
            if plan.passthrough:
                if self.cadences[sid].source_frame_num == 1:
                    self._prev[sid] = frame
                results[sid] = [OutputFrame(frame.pts, frame.fmt, frame.y,
                                            frame.uv, host=True)]
                continue
            f1 = self._prev[sid] if self._prev[sid] is not None else frame
            batch.append((sid, plan, self._planes(f1), self._planes(frame)))
            self._prev[sid] = frame
            plans[sid] = plan

        if not batch:
            return results

        out_fmt = FrameFormat(self.geom.actual_width, self.geom.height,
                              self._fmt.pixfmt)
        if not self.batch_dispatch:
            # sequential fused dispatches (measured faster; see module doc)
            step = _make_source_step(self.geom,
                                     self.config.frame_output_mode,
                                     self._scale_shift,
                                     self.config.cut_policy,
                                     self.config.scene_detection,
                                     self.config.model)
            for sid, plan, f1, f2 in batch:
                ts1 = jnp.asarray([s.blend for s in plan.outputs],
                                  jnp.float32)
                y, uv, _, _ = step(*f1, *f2, ts1,
                                   jnp.int32(self.config.initial_search_radius),
                                   jnp.int32(self.config.delta_scalar),
                                   jnp.int32(self.config.neighbor_bias_scalar),
                                   jnp.float32(self.config.black_level),
                                   jnp.float32(self.config.white_level),
                                   jnp.float32(self.config.scene_threshold))
                results[sid] = [
                    OutputFrame(slot.pts, out_fmt, y, uv, host=False,
                                index=k)
                    for k, slot in enumerate(plan.outputs)]
            return results

        n_max = max(len(p.outputs) for _, p, _, _ in batch)
        ts = np.zeros((len(batch), n_max), np.float32)
        for i, (_, plan, _, _) in enumerate(batch):
            blends = [s.blend for s in plan.outputs]
            ts[i, :len(blends)] = blends
            # pad with the last blend (wasted slots, stable shapes)
            ts[i, len(blends):] = blends[-1] if blends else 0.0

        step = _make_batched_step(self.geom, self.config.frame_output_mode,
                                  self._scale_shift, self.config.cut_policy,
                                  self.config.scene_detection,
                                  self.config.model)
        stack = lambda k: jnp.stack([b[2][k] for b in batch])  # noqa: E731
        stack2 = lambda k: jnp.stack([b[3][k] for b in batch])  # noqa: E731
        y, uv, _, _ = step(stack(0), stack(1), stack(2),
                           stack2(0), stack2(1), stack2(2),
                           jnp.asarray(ts),
                           jnp.int32(self.config.initial_search_radius),
                           jnp.int32(self.config.delta_scalar),
                           jnp.int32(self.config.neighbor_bias_scalar),
                           jnp.float32(self.config.black_level),
                           jnp.float32(self.config.white_level),
                           jnp.float32(self.config.scene_threshold))

        for i, (sid, plan, _, _) in enumerate(batch):
            results[sid] = [
                OutputFrame(slot.pts, out_fmt, y[i], uv[i], host=False,
                            index=k)
                for k, slot in enumerate(plan.outputs)]
        return results
