"""The Pallas whole-step flow kernel must match the XLA step branch
bit-exactly (interpret mode on CPU).

The XLA branch (ops/flow._make_step_branch) is itself pinned to the
oracle by tests/test_flow_golden.py, so equality here chains the Pallas
kernel (ops/pallas/flow_step.py) to the reference semantics
(calcDeltaSumsKernel.cl + determineLowestLayerKernel.cl +
adjustOffsetArrayKernel.cl)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpv_frame_interpolator_tpu.ops import flow as F
from mpv_frame_interpolator_tpu.ops.pallas import flow_step as FS


def _case(seed, H=48, W=64, max_calc_res=24, luma_shift=0):
    rng = np.random.default_rng(seed)
    geom = F.FlowGeometry.create(H, W, W, max_calc_res=max_calc_res)
    dt = np.uint16 if luma_shift else np.uint8
    top = 65535 if luma_shift else 255

    def plane(h, w):
        return jnp.asarray(rng.integers(0, top + 1, (h, w)).astype(dt))

    f1 = [plane(H, W), plane(H // 2, W // 2), plane(H // 2, W // 2)]
    f2 = [plane(H, W), plane(H // 2, W // 2), plane(H // 2, W // 2)]
    return geom, f1, f2, rng


def _fields(rng, lh, lw, D, rep, lo=-20, hi=20):
    """Committed (off_x, off_y) with exactly <= D distinct PAIRS (the
    pallas path is only selected when the pair count fits _FLOW_K, so
    the test generates fields inside that gate)."""
    vy = rng.integers(lo, hi, D)
    vx = rng.integers(lo, hi, D)
    pick = rng.integers(0, D, (-(-lh // rep), -(-lw // rep)))
    fy = vy[pick].repeat(rep, 0).repeat(rep, 1)[:lh, :lw]
    fx = vx[pick].repeat(rep, 0).repeat(rep, 1)[:lh, :lw]
    return (jnp.asarray(fx.astype(np.int32)),
            jnp.asarray(fy.astype(np.int32)))


def _run(seed, window, nb, radius, layers, D, luma_shift=0):
    geom, f1, f2, rng = _case(seed, luma_shift=luma_shift)
    lh, lw, rs = geom.low_h, geom.low_w, geom.res_scalar
    f2_probe = F._subsampled_f2(geom, *f2)
    stacks = F._phase_stacks(geom, *f1)
    assert stacks is not None

    off_x, off_y = _fields(rng, lh, lw, D, max(window, 1))
    is_y = jnp.int32(seed % 2)
    radius_t = jnp.int32(radius)
    ds = jnp.int32(8)
    nbs = jnp.int32(6)

    branch = F._make_step_branch(geom, window, nb, layers, luma_shift,
                                 *f1, f2_probe, stacks)
    ox_ref, oy_ref = jax.jit(branch)(off_x, off_y, is_y, radius_t, ds, nbs)

    meta = jnp.stack([is_y, radius_t, ds, nbs]).astype(jnp.int32)
    stacks2 = FS.pad_stacks_for_pallas(stacks, lh, lw, F._FLOW_BLOW)
    probe_t = jnp.int32 if luma_shift else jnp.int16
    probe_st = jnp.stack(f2_probe).astype(probe_t)
    adj2, valid = FS.flow_step_pallas(
        stacks2, probe_st, off_x, off_y, meta,
        lh=lh, lw=lw, s=1 << rs, rs=rs, Bl=F._FLOW_BLOW,
        window=window, nb_enabled=nb, layers=layers,
        luma_shift=luma_shift, K=F._FLOW_K, interpret=True)
    # the comparison is only meaningful inside the eligibility gates
    # (outside them BOTH paths take the same gather fallback)
    assert int(valid[0]) == 1
    ox_p, oy_p = FS.flow_step_commit(adj2, off_x, off_y, is_y, window,
                                     lh, lw)

    np.testing.assert_array_equal(np.asarray(ox_ref), np.asarray(ox_p))
    np.testing.assert_array_equal(np.asarray(oy_ref), np.asarray(oy_p))


@pytest.mark.parametrize("window,nb", [(1, True), (2, True), (4, False),
                                       (16, True)])
def test_windows(window, nb):
    _run(seed=window, window=window, nb=nb, radius=16, layers=16, D=5)


def test_step_parity_both_axes():
    _run(seed=0, window=2, nb=True, radius=16, layers=16, D=4)   # x step
    _run(seed=1, window=2, nb=True, radius=16, layers=16, D=4)   # y step


def test_radius_below_bucket():
    _run(seed=3, window=2, nb=True, radius=5, layers=16, D=5)
    _run(seed=4, window=4, nb=True, radius=8, layers=8, D=5)


def test_single_distinct_value():
    _run(seed=5, window=2, nb=True, radius=16, layers=16, D=1)


def test_many_distinct_values():
    _run(seed=6, window=2, nb=True, radius=16, layers=16, D=11)


def test_p010_luma_shift():
    _run(seed=7, window=4, nb=True, radius=16, layers=16, D=5,
         luma_shift=8)


def test_exceeding_field_reports_invalid():
    """A field with more distinct pairs than the K budget must come back
    valid=0 (the production cond then takes the gather fallback)."""
    geom, f1, f2, rng = _case(11)
    lh, lw, rs = geom.low_h, geom.low_w, geom.res_scalar
    f2_probe = F._subsampled_f2(geom, *f2)
    stacks = F._phase_stacks(geom, *f1)
    off_x, off_y = _fields(rng, lh, lw, F._FLOW_K + 8, 1)
    meta = jnp.stack([jnp.int32(0), jnp.int32(16), jnp.int32(8),
                      jnp.int32(6)]).astype(jnp.int32)
    stacks2 = FS.pad_stacks_for_pallas(stacks, lh, lw, F._FLOW_BLOW)
    probe_st = jnp.stack(f2_probe).astype(jnp.int16)
    _, valid = FS.flow_step_pallas(
        stacks2, probe_st, off_x, off_y, meta,
        lh=lh, lw=lw, s=1 << rs, rs=rs, Bl=F._FLOW_BLOW,
        window=2, nb_enabled=True, layers=16, luma_shift=0,
        K=F._FLOW_K, interpret=True)
    # _fields draws with replacement, so assert against the actual count
    pairs = len(set(zip(np.asarray(off_y).ravel().tolist(),
                        np.asarray(off_x).ravel().tolist())))
    assert (int(valid[0]) == 0) == (pairs > F._FLOW_K)
    assert pairs > F._FLOW_K   # seed chosen so the budget is exceeded
