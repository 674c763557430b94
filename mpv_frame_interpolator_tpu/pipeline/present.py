"""Present clock: display pacing and display-sync accounting.

Host-side analog of the reference's VO timing machinery:

* vo_null's simulated display (video/out/out_null... vo_null.c:39-53):
  flips are quantized to an fps grid; `VOCTRL_GET_DISPLAY_FPS` reports the
  simulated rate (:79-83).  `untimed` skips the waiting entirely
  (options/options.c:803 --untimed), which is what benchmarks use.
* vsync-interval estimation from presentation feedback
  (video/out/vo.c:481-530): a ring of flip timestamps produces the
  estimated refresh + jitter stddev.
* display-sync scheduling (player/video.c:810-944): each content frame is
  assigned an integer number of vsyncs (num_vsyncs), sub-vsync error is
  accumulated, and late frames are dropped.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Optional


@dataclasses.dataclass
class PresentInfo:
    vsync_index: int        # which vblank this frame was assigned to
    num_vsyncs: int         # display-sync repeats for this frame
    scheduled_time: float   # wall-clock target
    late_by: float          # >0 if the frame missed its vblank
    dropped: bool


class PresentClock:
    """Paces frame presentation against a real or simulated display."""

    def __init__(self, display_fps: float = 60.0, untimed: bool = False,
                 history: int = 1000):
        self.display_fps = display_fps
        self.vsync_interval = 1.0 / display_fps
        self.untimed = untimed
        self._t0: Optional[float] = None
        self._vsync_index = -1
        self._flips = deque(maxlen=history)   # vo.c: ring of 1000 samples
        self.drops = 0
        self.skips = 0            # vsync_skip_detection analog (vo.c:451)
        self.presented = 0
        self._last_pts: Optional[float] = None
        self._pts0: Optional[float] = None

    def get_display_fps(self) -> float:
        """mp_stream_info.get_display_fps analog (filters/filter.h:400-414)."""
        return self.display_fps

    def reset(self):
        self._t0 = None
        self._vsync_index = -1
        self._last_pts = None
        self._pts0 = None

    def present(self, pts: float) -> PresentInfo:
        """Schedule one output frame carrying content timestamp `pts`.

        Maps the pts timeline onto the vblank grid anchored at the first
        present; waits for the vblank unless untimed."""
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            self._pts0 = pts

        ideal = self._t0 + (pts - self._pts0)
        slot = max(round((ideal - self._t0) / self.vsync_interval), 0)
        num_vsyncs = 1
        if self._last_pts is not None:
            dur = pts - self._last_pts
            num_vsyncs = max(round(dur / self.vsync_interval), 1)
        self._last_pts = pts

        target = self._t0 + slot * self.vsync_interval
        late = 0.0
        dropped = False
        if not self.untimed:
            wait = target - time.perf_counter()
            if wait > 0:
                time.sleep(wait)
            else:
                late = -wait
                # vo.c:958-967: frames later than one vsync are dropped
                if late > self.vsync_interval:
                    dropped = True
                    self.drops += 1
        if slot <= self._vsync_index:
            slot = self._vsync_index + 1  # never present two frames on one vblank
        now2 = time.perf_counter()
        if self._flips and not self.untimed:
            # flip interval far beyond the refresh period = skipped vblanks
            interval = now2 - self._flips[-1]
            if interval > 1.5 * self.vsync_interval * max(num_vsyncs, 1):
                self.skips += 1
        self._vsync_index = slot
        self._flips.append(now2)
        self.presented += 1
        return PresentInfo(slot, num_vsyncs, target, late, dropped)

    # --- presentation feedback statistics (vo.c:416-530 analog) ---------

    def estimated_display_fps(self) -> float:
        if len(self._flips) < 10:
            return self.display_fps
        flips = list(self._flips)
        span = flips[-1] - flips[0]
        if span <= 0:
            return self.display_fps
        return (len(flips) - 1) / span

    def vsync_jitter(self) -> float:
        """Stddev of flip intervals (vo.c vsync_jitter analog)."""
        if len(self._flips) < 3:
            return 0.0
        flips = list(self._flips)
        ivals = [b - a for a, b in zip(flips, flips[1:])]
        mean = sum(ivals) / len(ivals)
        var = sum((x - mean) ** 2 for x in ivals) / len(ivals)
        return var ** 0.5
