"""Playlist playback: several sources chained into one pts timeline.

The reference's player core runs a per-file lifecycle loop
(`mp_play_files` -> `play_current_file`, player/loadfile.c:2080,1630)
re-initializing the decode chain per entry; its filter instances persist
process-wide.  Here the engine (one compiled geometry) IS the expensive
persistent part, so the chain inverts: ONE engine/pipeline consumes a
ChainedSource that re-anchors each entry's timestamps onto a continuous
output timeline (gapless, like mpv with --gapless-audio's video analog).

Entries whose geometry or pixel format differ from the first entry are
bilinearly rescaled / bit-depth converted on the host (the output chain's
autoconvert job, filters/f_autoconvert.c) so the device programs never
recompile mid-playlist.

The file boundary is content-discontinuous, which is exactly what the
engine's scene-cut detection folds into the warp (a cut at the splice,
like the reference displaying the first frame of the next file).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, List, Sequence

from mpv_frame_interpolator_tpu.frame import VideoFrame
from mpv_frame_interpolator_tpu.utils import get_logger

log = get_logger("playlist")


def parse_playlist(path: str) -> List[str]:
    """Entries of a playlist file: plain line lists, m3u/m3u8 (EXTM3U;
    `#EXT...` directives are metadata, every other non-blank line is an
    entry), and pls (`[playlist]` INI, `FileN=` keys in N order) --
    the formats demux_playlist.c's parsers cover that make sense
    without a URL stack.  Relative entries resolve against the playlist
    file's directory (demux_playlist.c's playlist_add_base), absolute
    paths and URLs (scheme://, synthetic:) pass through."""
    with open(path, encoding="utf-8", errors="replace") as fh:
        lines = [ln.strip().lstrip("﻿") for ln in fh]
    base = os.path.dirname(os.path.abspath(path))

    def resolve(entry: str) -> str:
        if ("://" in entry or entry.startswith("synthetic:")
                or os.path.isabs(entry) or entry == "-"):
            return entry
        return os.path.join(base, entry)

    low = path.lower()
    if low.endswith(".pls") or any(ln.lower() == "[playlist]"
                                   for ln in lines[:3]):
        numbered = []
        for ln in lines:
            if "=" not in ln:
                continue
            key, _, val = ln.partition("=")
            key = key.strip().lower()
            if key.startswith("file") and key[4:].isdigit() and val.strip():
                numbered.append((int(key[4:]), val.strip()))
        return [resolve(v) for _, v in sorted(numbered)]

    # m3u/m3u8 and plain line lists share one shape: '#' lines are
    # comments/directives, the rest are entries
    return [resolve(ln) for ln in lines
            if ln and not ln.startswith("#")]


class ChainedSource:
    """Iterate `entries` (opaque tokens) as one continuous source.

    `open_fn(entry)` returns an iterable of VideoFrames with
    width/height/fps attributes (CLI sources).  The first entry fixes the
    output geometry; later entries are converted to it."""

    def __init__(self, entries: Sequence, open_fn: Callable,
                 loop: int = 0):
        if not entries:
            raise ValueError("empty playlist")
        self._entries = list(entries)
        self._open = open_fn
        self._current = None
        self.loop = loop            # extra whole-playlist repeats (-1 = inf)
        self.entry_index = 0        # playlist-pos property analog
        first = open_fn(self._entries[0])
        self._current = first
        for attr in ("width", "height", "fps", "fmt", "pixfmt"):
            if hasattr(first, attr):
                setattr(self, attr, getattr(first, attr))

    def _convert(self, frame: VideoFrame, scaler) -> VideoFrame:
        if scaler is not None:
            frame = scaler(frame)
        if frame.fmt.pixfmt != self.pixfmt:
            from mpv_frame_interpolator_tpu.io.convert import convert_frame
            frame = convert_frame(frame, self.pixfmt)
        return frame

    def _iter_entry(self, idx: int, offset: float):
        """Yield (frame, rebased_pts); returns the next offset."""
        src = self._current if idx == 0 and self._current is not None \
            else self._open(self._entries[idx])
        self._current = None
        self.entry_index = idx
        scaler = None
        w = getattr(src, "width", self.width)
        h = getattr(src, "height", self.height)
        if (w, h) != (self.width, self.height):
            from mpv_frame_interpolator_tpu.io.filters import scale
            scaler = scale(self.width, self.height)
            log.info("playlist entry %d: rescaling %dx%d -> %dx%d",
                     idx, w, h, self.width, self.height)
        base = None
        last = None
        dt = 1.0 / src.fps if getattr(src, "fps", 0) > 0 else 1 / 24.0
        n = 0
        try:
            for f in src:
                if base is None:
                    base = f.pts
                pts = offset + (f.pts - base)
                if last is not None and pts - last > 0:
                    dt = pts - last
                out = self._convert(f, scaler)
                if out is not f and f.recycle is not None:
                    f.recycle()     # converted copy; source buffer is free
                yield dataclasses.replace(out, pts=pts)
                last = pts
                n += 1
        finally:
            if hasattr(src, "close"):
                src.close()
        log.info("playlist entry %d done (%d frames)", idx, n)
        self._next_offset = (last + dt) if last is not None else offset

    def __iter__(self) -> Iterator[VideoFrame]:
        offset = 0.0
        rounds = 0
        while True:
            for idx in range(len(self._entries)):
                self._next_offset = offset
                yield from self._iter_entry(idx, offset)
                offset = self._next_offset
            if self.loop == -1:
                continue
            if rounds >= self.loop:
                return
            rounds += 1

    def close(self):
        if self._current is not None and hasattr(self._current, "close"):
            self._current.close()
