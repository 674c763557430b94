"""Scene-change detection.

The reference advertises automatic scene-change detection but ships with it
deactivated and no implementation in this snapshot (README.md:22; SURVEY.md
§2.1 H1 note).  The rebuild implements the advertised behavior: when the
mean per-pixel luma SAD between consecutive source frames (measured at the
flow calc resolution) exceeds a threshold, interpolation is bypassed across
the cut -- intermediate outputs snap to the nearer source frame instead of
morphing through the discontinuity.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def cut_score(y1_full, y2_full, res_scalar: int, bit_shift: int = 0):
    """Device-side mean abs luma difference at the flow calc resolution.

    Traced inside the engine's fused source step (one dispatch per pair);
    returns a 0-dim jnp array so the caller controls when to sync.  The
    downsample is a stride-slice to the flow pyramid's base resolution
    (2**res_scalar), matching where the reference would have measured had
    it shipped its advertised detection (README.md:22)."""
    s = 1 << res_scalar

    def _sub(y):
        if s == 1:
            return y
        rows = y[::s]
        h2, w = rows.shape
        if w % s == 0:
            # bit-identical to y[::s, ::s], but the LANE-stride slice
            # lowers ~80x slower on this chip (2.5 ms vs 0.03 ms for a
            # 4K pair): keep the cheap row-stride slice and take every
            # s-th column via reshape + trailing index instead
            # (measured in tools/glue_probe.py, round 5)
            return rows.reshape(h2, w // s, s)[..., 0]
        return rows[:, ::s]

    d = jnp.abs(_sub(y1_full).astype(jnp.int32)
                - _sub(y2_full).astype(jnp.int32))
    if bit_shift:
        d = d >> bit_shift
    return jnp.mean(d.astype(jnp.float32))


@dataclasses.dataclass
class SceneChangeDetector:
    """Runtime knobs + host-side decision for scene-cut handling; the score
    itself is computed on device by `cut_score` inside the fused step."""

    enabled: bool = True
    threshold: float = 28.0     # mean |Y1-Y2| per low-res pixel, 8-bit scale
    last_score: float = 0.0

    def is_cut(self, score_value: float) -> bool:
        self.last_score = float(score_value)
        return self.enabled and self.last_score > self.threshold
