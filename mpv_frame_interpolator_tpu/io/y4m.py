"""YUV4MPEG2 (.y4m) reader/writer and raw YUV reader.

The host-side media boundary.  The build image has no FFmpeg/PyAV, so the
framework speaks the simplest interchange formats every tool understands:
y4m (ffmpeg's `-f yuv4mpegpipe`) and raw planar I420/I420-10LE.  The decode
layer (io/decode.py) shells out to ffmpeg into this pipe format when a real
decoder is present on the system.

Replaces, for the rebuild's scope, the reference's demux/decode stack
(demux/demux.c, video/decode/vd_lavc.c) whose output HopperRender consumes
as NV12 frames with pts + nominal_fps (vf_HopperRender.c:416-428).
"""

from __future__ import annotations

from typing import Iterator, BinaryIO

import numpy as np

from mpv_frame_interpolator_tpu.frame import (
    FrameFormat, VideoFrame, NV12, P010, interleave_chroma, split_chroma)


class Y4MError(ValueError):
    pass


_COLORSPACE_8 = {"420", "420jpeg", "420mpeg2", "420paldv"}
_COLORSPACE_10 = {"420p10"}


def _parse_ratio(s: str) -> float:
    num, den = s.split(":")
    den = int(den)
    return int(num) / den if den else 0.0


class Y4MReader:
    """Streaming y4m demuxer -> VideoFrame (NV12 or P010 planes)."""

    def __init__(self, fh: BinaryIO, start_pts: float = 0.0):
        self._fh = fh
        header = fh.readline().decode("ascii", "replace").strip()
        if not header.startswith("YUV4MPEG2"):
            raise Y4MError("not a YUV4MPEG2 stream")
        self.width = self.height = 0
        self.fps = 0.0
        cs = "420mpeg2"
        for tok in header.split()[1:]:
            key, val = tok[0], tok[1:]
            if key == "W":
                self.width = int(val)
            elif key == "H":
                self.height = int(val)
            elif key == "F":
                self.fps = _parse_ratio(val)
            elif key == "C":
                cs = val
        if not (self.width and self.height):
            raise Y4MError(f"missing dimensions in header: {header!r}")
        if cs in _COLORSPACE_8:
            self.pixfmt = NV12
        elif cs in _COLORSPACE_10:
            self.pixfmt = P010
        else:
            raise Y4MError(f"unsupported colorspace C{cs} (need 4:2:0)")
        # 4:2:0 y4m streams always carry even dimensions, but be defensive:
        # crop odd sizes down (the engine requires even geometry)
        self._crop_w = self.width & ~1
        self._crop_h = self.height & ~1
        self.fmt = FrameFormat(self._crop_w, self._crop_h, self.pixfmt)
        self._pts = start_pts
        self._start_pts = start_pts
        self._dt = 1.0 / self.fps if self.fps > 0 else 1.0 / 24.0
        # seek support (demux_seek analog): y4m frames are fixed-size
        # records after the stream header, so frame n lives at a computable
        # byte offset (the reference's demuxers keep a seek index,
        # demux/demux_mkv.c; y4m needs none)
        itemsize = self.fmt.dtype().itemsize
        self._payload = (self.width * self.height
                         + 2 * (self.width // 2) * (self.height // 2)) * itemsize
        self._marker_len: int | None = None
        try:
            self._data_start = fh.tell()
            self._seekable = bool(fh.seekable())
        except (OSError, AttributeError):
            self._data_start = 0
            self._seekable = False

    # -- seeking ----------------------------------------------------------

    def seekable(self) -> bool:
        return self._seekable

    def _ensure_marker_len(self):
        """Learn the FRAME marker line length from the first frame (markers
        may carry parameters; virtually all streams use a constant line)."""
        if self._marker_len is not None:
            return
        pos = self._fh.tell()
        self._fh.seek(self._data_start)
        line = self._fh.readline()
        if not line.startswith(b"FRAME"):
            raise Y4MError(f"bad frame marker at stream start: {line[:20]!r}")
        self._marker_len = len(line)
        self._fh.seek(pos)

    def n_frames(self) -> int:
        """Total frame count (only for seekable streams)."""
        if not self._seekable:
            raise Y4MError("stream is not seekable")
        self._ensure_marker_len()
        pos = self._fh.tell()
        end = self._fh.seek(0, 2)
        self._fh.seek(pos)
        rec = self._marker_len + self._payload
        return max((end - self._data_start) // rec, 0)

    def seek_frame(self, n: int):
        """O(1) byte seek to frame n (falls back to a linear marker scan if
        the stream uses variable-length FRAME lines)."""
        if not self._seekable:
            raise Y4MError("stream is not seekable")
        self._ensure_marker_len()
        n = max(int(n), 0)
        rec = self._marker_len + self._payload
        target = self._data_start + n * rec
        self._fh.seek(target)
        line = self._fh.readline()
        if line and not line.startswith(b"FRAME"):
            # variable-length markers: scan forward from the data start
            self._fh.seek(self._data_start)
            for _ in range(n):
                marker = self._fh.readline()
                if not marker.startswith(b"FRAME"):
                    break          # seeked past EOF; iteration just ends
                self._fh.seek(self._payload, 1)
        else:
            self._fh.seek(target)
        self._pts = self._start_pts + n * self._dt

    def seek_pts(self, pts: float) -> float:
        """Seek to the frame covering `pts`; returns the actual frame pts."""
        n = int(max(pts - self._start_pts, 0.0) / self._dt + 1e-6)
        self.seek_frame(n)
        return self._pts

    def __iter__(self) -> Iterator[VideoFrame]:
        w, h = self.width, self.height
        dtype = self.fmt.dtype
        itemsize = dtype().itemsize
        ysz = w * h * itemsize
        csz = (w // 2) * (h // 2) * itemsize
        total = ysz + 2 * csz
        readinto = getattr(self._fh, "readinto", None)
        while True:
            line = self._fh.readline()
            if not line:
                return
            if not line.startswith(b"FRAME"):
                raise Y4MError(f"bad frame marker: {line[:20]!r}")
            if readinto is not None:
                # read straight into the frame's own buffer: one copy
                # fewer than read()+frombuffer (the planes below are views)
                buf = np.empty(total, np.uint8)
                mv = memoryview(buf)
                filled = 0
                while filled < total:
                    got = readinto(mv[filled:])
                    if not got:
                        break
                    filled += got
                if filled < total:
                    return
            else:
                buf = self._fh.read(total)
                if len(buf) < total:
                    return
            y = np.frombuffer(buf, dtype, w * h, 0).reshape(h, w)
            u = np.frombuffer(buf, dtype, (w // 2) * (h // 2), ysz).reshape(h // 2, w // 2)
            v = np.frombuffer(buf, dtype, (w // 2) * (h // 2), ysz + csz).reshape(h // 2, w // 2)
            if self.pixfmt == P010:
                # y4m 420p10 carries 10-bit values; P010 uses the top bits
                y = (y.astype(np.uint16) << 6)
                u = (u.astype(np.uint16) << 6)
                v = (v.astype(np.uint16) << 6)
            if (self._crop_w, self._crop_h) != (w, h):
                y = y[:self._crop_h, :self._crop_w]
                u = u[:self._crop_h // 2, :self._crop_w // 2]
                v = v[:self._crop_h // 2, :self._crop_w // 2]
            frame = VideoFrame(np.ascontiguousarray(y),
                               interleave_chroma(u, v), self.fmt,
                               pts=self._pts, nominal_fps=self.fps)
            self._pts += self._dt
            yield frame


class Y4MWriter:
    """VideoFrame -> y4m stream (planar I420 / I420p10)."""

    def __init__(self, fh: BinaryIO, width: int, height: int, fps: float,
                 pixfmt: str = NV12):
        self._fh = fh
        self.pixfmt = pixfmt
        if abs(fps - round(fps)) < 1e-9:
            ratio = f"{int(round(fps))}:1"
        else:
            num = int(round(fps * 1001))
            if abs(num / 1001 - fps) < 1e-6:
                ratio = f"{num}:1001"      # NTSC rates (23.976, 29.97, ...)
            else:
                ratio = f"{int(round(fps * 1000))}:1000"
        cs = "C420mpeg2" if pixfmt == NV12 else "C420p10"
        fh.write(f"YUV4MPEG2 W{width} H{height} F{ratio} Ip A1:1 {cs}\n"
                 .encode("ascii"))
        self._n = 0

    def write(self, frame: VideoFrame):
        self._fh.write(b"FRAME\n")
        w = frame.fmt.width
        u, v = split_chroma(frame.uv[:, :w])
        y = frame.y[:, :w]
        if self.pixfmt == P010:
            y, u, v = (y >> 6), (u >> 6), (v >> 6)
        self._fh.write(np.ascontiguousarray(y).tobytes())
        self._fh.write(np.ascontiguousarray(u).tobytes())
        self._fh.write(np.ascontiguousarray(v).tobytes())
        self._n += 1

    def close(self):
        self._fh.flush()


class RawYUVReader:
    """Raw planar I420 (8-bit) or I420 10LE reader; geometry supplied by the
    caller (like mpv's demux_raw --demuxer-rawvideo-*)."""

    def __init__(self, fh: BinaryIO, width: int, height: int, fps: float,
                 pixfmt: str = NV12, start_pts: float = 0.0):
        self.fmt = FrameFormat(width, height, pixfmt)
        self._fh = fh
        self.fps = fps
        self._pts = start_pts
        self._start_pts = start_pts
        itemsize = self.fmt.dtype().itemsize
        self._payload = (width * height
                         + 2 * (width // 2) * (height // 2)) * itemsize
        try:
            self._data_start = fh.tell()
            self._seekable = bool(fh.seekable())
        except (OSError, AttributeError):
            self._data_start = 0
            self._seekable = False

    def seekable(self) -> bool:
        return self._seekable

    def n_frames(self) -> int:
        if not self._seekable:
            raise ValueError("stream is not seekable")
        pos = self._fh.tell()
        end = self._fh.seek(0, 2)
        self._fh.seek(pos)
        return max((end - self._data_start) // self._payload, 0)

    def seek_frame(self, n: int):
        """O(1) byte seek (raw streams are pure fixed-size records)."""
        if not self._seekable:
            raise ValueError("stream is not seekable")
        n = max(int(n), 0)
        self._fh.seek(self._data_start + n * self._payload)
        self._pts = self._start_pts + n / self.fps

    def seek_pts(self, pts: float) -> float:
        n = int(max(pts - self._start_pts, 0.0) * self.fps + 1e-6)
        self.seek_frame(n)
        return self._pts

    def __iter__(self) -> Iterator[VideoFrame]:
        w, h = self.fmt.width, self.fmt.height
        dtype = self.fmt.dtype
        itemsize = dtype().itemsize
        ysz, csz = w * h * itemsize, (w // 2) * (h // 2) * itemsize
        while True:
            buf = self._fh.read(ysz + 2 * csz)
            if len(buf) < ysz + 2 * csz:
                return
            y = np.frombuffer(buf, dtype, w * h, 0).reshape(h, w)
            u = np.frombuffer(buf, dtype, (w // 2) * (h // 2), ysz).reshape(h // 2, w // 2)
            v = np.frombuffer(buf, dtype, (w // 2) * (h // 2), ysz + csz).reshape(h // 2, w // 2)
            if self.fmt.pixfmt == P010:
                y, u, v = (y.astype(np.uint16) << 6), (u.astype(np.uint16) << 6), (v.astype(np.uint16) << 6)
            yield VideoFrame(np.ascontiguousarray(y), interleave_chroma(u, v),
                             self.fmt, pts=self._pts, nominal_fps=self.fps)
            self._pts += 1.0 / self.fps


def open_source(path: str, **kw) -> Iterator[VideoFrame]:
    """Open a media path: .y4m natively; anything else via ffmpeg if
    available (io/decode.py)."""
    if path.endswith(".y4m"):
        return iter(Y4MReader(open(path, "rb"), **kw))
    from mpv_frame_interpolator_tpu.io.decode import ffmpeg_source
    return ffmpeg_source(path, **kw)
