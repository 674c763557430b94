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


@dataclasses.dataclass
class SceneChangeDetector:
    enabled: bool = True
    threshold: float = 28.0     # mean |Y1-Y2| per low-res pixel, 8-bit scale
    last_score: float = 0.0

    def score(self, y1_low, y2_low, bit_shift: int = 0):
        """Device-side mean abs luma difference (returns a 0-dim jnp array
        so the caller controls when to sync)."""
        a = y1_low.astype(jnp.int32)
        b = y2_low.astype(jnp.int32)
        d = jnp.abs(a - b)
        if bit_shift:
            d = d >> bit_shift
        return jnp.mean(d.astype(jnp.float32))

    def is_cut(self, score_value: float) -> bool:
        self.last_score = float(score_value)
        return self.enabled and self.last_score > self.threshold
