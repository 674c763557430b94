"""Whole-pair packed warp kernel equality (interpret mode): the
one-launch-per-plane N-output kernel (ops/pallas/warp_pair.py) must be
bit-identical to the XLA shift composition (_warp_sample
sampling="shift" + _blend_fix + default-levels clip + NV12 interleave)
for EVERY blend position at once.

The packed-domain tricks under test: row-quad int32 bitcast, word roll
+ intra-word byte rotate row shifts, lane-roll column shifts, and the
carry-free byte-equality select (tools/pallas_pack_probe.py holds the
primitive-level proofs; this is the end-to-end one).

Reference semantics: warpFrameKernel.cl:138-204 + the blend path of
vf_HopperRender.c, via the shift decomposition of ARCHITECTURE.md §3."""

import numpy as np
import pytest

import jax.numpy as jnp

from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry
from mpv_frame_interpolator_tpu.ops import warp as W
from mpv_frame_interpolator_tpu.ops.pallas import warp_pair as WP


def _planes(rng, h, w):
    return (jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8)),
            jnp.asarray(rng.integers(0, 256, (h // 2, w // 2))
                        .astype(np.uint8)),
            jnp.asarray(rng.integers(0, 256, (h // 2, w // 2))
                        .astype(np.uint8)))


def _blurred(rng, geom, values):
    lh, lw = geom.low_h, geom.low_w
    pick = rng.integers(0, len(values), (lh, lw))
    ox = np.array([v[0] for v in values], np.int32)[pick]
    oy = np.array([v[1] for v in values], np.int32)[pick]
    return jnp.asarray(np.stack([ox, oy]))


def _run(h, w, values, ts, seed=0):
    geom = FlowGeometry.create(h, w, w)
    rng = np.random.default_rng(seed)
    f1 = _planes(rng, h, w)
    f2 = _planes(rng, h, w)
    blurred = _blurred(rng, geom, values)
    fields = W._warp_fields(geom, blurred)
    prep = W._sampler_prep(geom, fields, *f1, *f2, fused=True)
    assert bool(prep["ok"]), "test field must stay inside the shift gates"
    fields["SPREP"] = prep

    tv = jnp.asarray(np.asarray(ts, np.float32))
    y_p, uv_p = WP.blended_pair_from_prep(geom, prep, tv, 0)

    for n, t in enumerate(np.asarray(ts, np.float32)):
        y_r, u_r, v_r = W._warp_sample(
            geom, W.BLENDED_FRAME, 0, jnp.uint8, *f1, *f2, fields,
            jnp.float32(t), jnp.float32(0.0), jnp.float32(255.0),
            sampling="shift")
        hc, wc = u_r.shape
        uv_r = jnp.stack((u_r, v_r), axis=2).reshape(hc, wc * 2)
        assert np.array_equal(np.asarray(y_p[n]), np.asarray(y_r)), \
            f"luma mismatch at position {n} (t={t})"
        assert np.array_equal(np.asarray(uv_p[n]), np.asarray(uv_r)), \
            f"chroma mismatch at position {n} (t={t})"


def test_pair_zero_flow():
    _run(64, 96, [(0, 0)], [0.25, 0.5, 0.75])


def test_pair_small_multi_value():
    # residuals exercise every intra-word byte rotate (dy % 4 in
    # 0..3) and both shift directions
    _run(64, 96, [(0, 0), (1, 0), (-1, 2), (3, -2), (-5, -7)],
         [0.2, 0.4, 0.6, 0.8])


def test_pair_large_displacements():
    # |flow|*t near the clip bound and crossing lane groups
    _run(96, 128, [(40, -60), (-80, 33), (127, 127)],
         [0.1, 0.5, 0.9])


def test_pair_single_position():
    _run(64, 96, [(2, -3), (0, 5)], [0.5])


def test_pair_many_positions():
    _run(64, 96, [(1, 1), (-2, 4)],
         np.linspace(0.1, 0.9, 7))


def test_pair_engine_stage_equality():
    """Whole-stage check: _warp_stage with warp_sampling='pair' must
    match warp_sampling='shift' bit-for-bit (same cut folding, same
    packaging)."""
    from mpv_frame_interpolator_tpu.pipeline.engine import _warp_stage
    h, w = 64, 96
    geom = FlowGeometry.create(h, w, w)
    rng = np.random.default_rng(3)
    f1 = _planes(rng, h, w)
    f2 = _planes(rng, h, w)
    blurred = _blurred(rng, geom, [(0, 0), (2, -1), (-3, 4)])
    ts = jnp.asarray(np.linspace(0.2, 0.8, 4).astype(np.float32))
    args = (geom, W.BLENDED_FRAME, 0, "nearest", False, "hopper",
            f1[0], f1[1], f1[2], f2[0], f2[1], f2[2], blurred,
            jnp.float32(0.0), ts, jnp.float32(0.0), jnp.float32(255.0),
            jnp.float32(28.0))
    y_s, uv_s = _warp_stage(*args, warp_sampling="shift")
    y_p, uv_p = _warp_stage(*args, warp_sampling="pair")
    assert np.array_equal(np.asarray(y_p), np.asarray(y_s))
    assert np.array_equal(np.asarray(uv_p), np.asarray(uv_s))
