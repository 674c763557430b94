"""Lane-stride-free column subsampling.

On this chip a strided slice along the LANE (minor) dimension lowers
~80x slower than the same selection expressed as reshape + trailing
index (measured in tools/glue_probe.py, round 5: scene cut_score's
``y[::8, ::8]`` cost 2.5 ms/pair at 4K vs 0.03 ms for the reshape
form -- commit c7085fd).  Every device-side ``x[..., off::s]`` on a
wide plane should go through :func:`col_take` instead; the two forms
are bit-identical (element-equal asserted in tests/test_lanes.py).

Row (sublane) strides are cheap and stay as plain slices.
"""

from __future__ import annotations


def col_take(x, s: int, offset: int = 0):
    """``x[..., offset::s]`` without the lane-stride slice.

    Bit-identical for any array whose trailing dimension is a multiple
    of ``s`` (the common case for frame planes); falls back to the
    plain slice otherwise.  ``offset`` must be < ``s``.
    """
    if s == 1:
        return x if offset == 0 else x[..., offset:]
    w = x.shape[-1]
    if w % s:
        return x[..., offset::s]
    return x.reshape(*x.shape[:-1], w // s, s)[..., offset]


def deinterleave_uv(uv):
    """NV12 interleaved UV plane -> (u, v) half-width planes.

    Device-side analog of frame.split_chroma (which is host NumPy);
    equals ``(uv[:, 0::2], uv[:, 1::2])`` bit-exactly.
    """
    return col_take(uv, 2, 0), col_take(uv, 2, 1)
