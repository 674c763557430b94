"""Fused blended-warp kernel equality (interpret mode): the whole-output
Pallas kernels (ops/pallas/warp_fused.py) must be bit-identical to the
XLA composition (_warp_sample sampling="shift" + _blend_fix +
default-levels clip + NV12 interleave) they replace.

Reference semantics: warpFrameKernel.cl:138-204 + the blend path of
vf_HopperRender.c, via the shift decomposition of ARCHITECTURE.md §3."""

import numpy as np
import pytest

import jax.numpy as jnp

from mpv_frame_interpolator_tpu.ops.flow import FlowGeometry
from mpv_frame_interpolator_tpu.ops import warp as W
from mpv_frame_interpolator_tpu.ops.pallas import warp_fused as WF


def _planes(rng, h, w, dtype=np.uint8, hi=256):
    return (jnp.asarray(rng.integers(0, hi, (h, w)).astype(dtype)),
            jnp.asarray(rng.integers(0, hi, (h // 2, w // 2)).astype(dtype)),
            jnp.asarray(rng.integers(0, hi, (h // 2, w // 2)).astype(dtype)))


def _blurred(rng, geom, values):
    """Low-res flow field drawing from a fixed set of (ox, oy) pairs."""
    lh, lw = geom.low_h, geom.low_w
    pick = rng.integers(0, len(values), (lh, lw))
    ox = np.array([v[0] for v in values], np.int32)[pick]
    oy = np.array([v[1] for v in values], np.int32)[pick]
    return jnp.asarray(np.stack([ox, oy]))


def _run(h, w, values, t, seed=0, scale_shift=0):
    geom = FlowGeometry.create(h, w, w)
    rng = np.random.default_rng(seed)
    dt = np.uint16 if scale_shift else np.uint8
    hi = 1 << 16 if scale_shift else 256
    f1 = _planes(rng, h, w, dt, hi)
    f2 = _planes(rng, h, w, dt, hi)
    blurred = _blurred(rng, geom, values)
    fields = W._warp_fields(geom, blurred)
    prep = W._sampler_prep(geom, fields, *f1, *f2, fused=True)
    assert bool(prep["ok"]), "test field must stay inside the shift gates"
    fields["SPREP"] = prep

    tt = jnp.float32(t)
    y_f, uv_f = WF.blended_from_prep(geom, prep, tt, scale_shift)

    y_r, u_r, v_r = W._warp_sample(
        geom, W.BLENDED_FRAME, scale_shift, jnp.uint16 if scale_shift
        else jnp.uint8, *f1, *f2, fields, tt,
        jnp.float32(0.0), jnp.float32(255.0), sampling="shift")
    hc, wc = u_r.shape
    uv_r = jnp.stack((u_r, v_r), axis=2).reshape(hc, wc * 2)

    assert np.array_equal(np.asarray(y_f), np.asarray(y_r))
    assert np.array_equal(np.asarray(uv_f), np.asarray(uv_r))


def test_single_value_rs0():
    _run(256, 512, [(3, -2)], t=0.5)


def test_multi_value_rs2():
    _run(544, 1024, [(0, 0), (5, 2), (-7, 3), (12, -9)], t=0.25, seed=1)


def test_endpoint_t():
    # cadence cuts snap t to 0/1: weights 2^24/0 must pass sources
    # through exactly
    _run(544, 1024, [(2, 1), (-3, 4)], t=0.0, seed=2)
    _run(544, 1024, [(2, 1), (-3, 4)], t=1.0, seed=3)


def test_p010_scale_shift():
    _run(544, 1024, [(1, -1), (6, 6)], t=0.4, seed=4, scale_shift=8)


def test_many_values_rs2():
    vals = [(x, y) for x in (-9, -3, 0, 4, 11) for y in (-5, 0, 7)]
    _run(544, 1024, vals, t=0.6, seed=5)
