"""Interpolator model families.

The reference ships exactly one interpolation algorithm (HopperRender's
hierarchical block-matching flow).  The rebuild formalizes the slot so the
engine can swap families:

  hopper  -- the flagship: hierarchical block-matching optical flow +
             bidirectional warp (ops/flow.py + ops/warp.py), reference-
             parity semantics
  hopperx -- hopper + occlusion-aware blending: where the forward- and
             backward-warped samples disagree, the blend shifts toward
             the temporally nearer source instead of cross-fading through
             the ghost (ops/warp.py:_occlusion_adjust).  A quality
             extension the reference does not have.
  hopperq -- hopper + sub-pixel bilinear sampling (1/64-pel): the
             reference rounds warp positions to whole pixels
             (warpFrameKernel.cl:165-168); hopperq reconstructs fractional
             motion, measurably raising fidelity on smooth pans.
  hopperxq -- hopperq + hopperx combined: sub-pixel sampling with
             occlusion-aware blending on top -- the premium quality
             family (fractional motion everywhere, no cross-fade ghosts
             at occlusion boundaries).
  blend   -- zero-flow cross-fade (what BlendedFrame degenerates to with a
             null flow field); cheap fallback under load
  repeat  -- nearest-source snap (classic player cadence without
             interpolation; also the scene-cut behavior)

All families ride the same fused source-step dispatch; `blend` and
`repeat` simply force the flow field / blend positions, so they share the
warp's levels/output-mode semantics and cost almost nothing extra to
compile.
"""

MODELS = ("hopper", "hopperx", "hopperq", "hopperxq", "blend", "repeat")


def validate(name: str) -> str:
    if name not in MODELS:
        raise ValueError(f"unknown interpolator model {name!r}; "
                         f"choose from {MODELS}")
    return name
