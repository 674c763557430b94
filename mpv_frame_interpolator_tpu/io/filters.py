"""Host-side user frame filters (the --vf chain analog).

The reference routes decoded frames through a user-configurable filter list
before HopperRender (filters/user_filters.c --vf parsing; auto rotate/vflip
filters in filters/f_auto_filters.c).  The rebuild's equivalents operate on
host VideoFrames ahead of the engine; they compose as a simple chain:

    chain = parse_chain("crop=640:360:10:10,vflip")
    frames = apply_chain(chain, source)

Available: crop=w:h[:x:y], vflip, hflip, rotate=90|180|270, fps=N
(drop/duplicate to a fixed rate -- the f_utils fixed-fps analog),
setpts=offset (pts shift).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, List

import numpy as np

from mpv_frame_interpolator_tpu.frame import (
    FrameFormat, VideoFrame, split_chroma, interleave_chroma)


def _remake(frame: VideoFrame, y, u, v, pts=None) -> VideoFrame:
    h, w = y.shape
    fmt = FrameFormat(w, h, frame.fmt.pixfmt,
                      primaries=frame.fmt.primaries,
                      transfer=frame.fmt.transfer, matrix=frame.fmt.matrix)
    return VideoFrame(np.ascontiguousarray(y), interleave_chroma(
        np.ascontiguousarray(u), np.ascontiguousarray(v)), fmt,
        pts=frame.pts if pts is None else pts,
        nominal_fps=frame.nominal_fps)


def crop(w: int, h: int, x: int = 0, y: int = 0):
    if w % 2 or h % 2 or x % 2 or y % 2:
        raise ValueError("crop geometry must be even (4:2:0)")

    def f(frame: VideoFrame) -> VideoFrame:
        u, v = split_chroma(frame.uv)
        return _remake(frame, frame.y[y:y + h, x:x + w],
                       u[y // 2:(y + h) // 2, x // 2:(x + w) // 2],
                       v[y // 2:(y + h) // 2, x // 2:(x + w) // 2])
    return f


def vflip():
    def f(frame: VideoFrame) -> VideoFrame:
        u, v = split_chroma(frame.uv)
        return _remake(frame, frame.y[::-1], u[::-1], v[::-1])
    return f


def hflip():
    def f(frame: VideoFrame) -> VideoFrame:
        u, v = split_chroma(frame.uv)
        return _remake(frame, frame.y[:, ::-1], u[:, ::-1], v[:, ::-1])
    return f


def rotate(degrees: int):
    if degrees not in (90, 180, 270):
        raise ValueError("rotate supports 90/180/270")
    k = degrees // 90

    def f(frame: VideoFrame) -> VideoFrame:
        u, v = split_chroma(frame.uv)
        return _remake(frame, np.rot90(frame.y[:, :frame.fmt.width], k),
                       np.rot90(u[:, :frame.fmt.width // 2], k),
                       np.rot90(v[:, :frame.fmt.width // 2], k))
    return f


def setpts(offset: float):
    def f(frame: VideoFrame) -> VideoFrame:
        return frame.with_pts(frame.pts + offset)
    return f


class fps:
    """Fixed-fps converter: drop/duplicate to a target rate
    (filters/f_utils.c mp_fixed_fps_create analog)."""

    def __init__(self, target: float):
        self.target = target
        self._next_pts = None

    def __call__(self, frame: VideoFrame):
        # generator-style filter: may emit 0..N frames
        out = []
        dt = 1.0 / self.target
        if self._next_pts is None:
            self._next_pts = frame.pts
        while frame.pts > self._next_pts - dt / 2:
            f2 = frame.with_pts(self._next_pts)
            f2 = VideoFrame(f2.y, f2.uv, f2.fmt, f2.pts, self.target)
            out.append(f2)
            self._next_pts += dt
        return out


def parse_chain(spec: str) -> List[Callable]:
    """'crop=640:360,vflip,fps=30' -> list of filter callables."""
    chain: List[Callable] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, argstr = part.partition("=")
        args = [a for a in argstr.split(":") if a] if argstr else []
        if name == "crop":
            chain.append(crop(*[int(a) for a in args]))
        elif name == "vflip":
            chain.append(vflip())
        elif name == "hflip":
            chain.append(hflip())
        elif name == "rotate":
            chain.append(rotate(int(args[0])))
        elif name == "fps":
            chain.append(fps(float(args[0])))
        elif name == "setpts":
            chain.append(setpts(float(args[0])))
        else:
            raise ValueError(f"unknown filter {name!r}")
    return chain


def apply_chain(chain: List[Callable],
                source: Iterable[VideoFrame]) -> Iterator[VideoFrame]:
    def run_one(frames, f):
        for fr in frames:
            out = f(fr)
            if out is None:
                continue
            if isinstance(out, VideoFrame):
                yield out
            else:
                yield from out

    frames: Iterable[VideoFrame] = source
    for f in chain:
        frames = run_one(frames, f)
    return iter(frames)
