#!/usr/bin/env python
"""Honest per-PIECE chip timing of the flow pyramid step.

Each piece of the scan body (_pyramid_step_traced) is timed standalone
with the scan-chained method (tools/chip_time.py): a program executes the
piece K times with a data dependency, and (t(K2)-t(K1))/(K2-K1) cancels
every fixed cost.

Harness-honesty rules (learned the hard way):
* every iteration PERTURBS the piece's real inputs (a hoistable or
  constant-foldable body measures nothing), and
* the carry depends on a FULL reduction of the piece's output (a scalar
  slice lets XLA dead-code-eliminate the rest of the work).

    PYTHONPATH=.:$PYTHONPATH python tools/flow_breakdown.py [WxH]
"""

import sys
import time

import numpy as np


def chained_time(make_body, k1=6, k2=30, repeats=2):
    """Seconds per body execution, scan-chained."""
    import jax
    import jax.numpy as jnp

    def build(k):
        body = make_body()
        return jax.jit(lambda: jax.lax.scan(body, jnp.int32(0),
                                            None, length=k)[1])

    fns = {k: build(k) for k in (k1, k2)}
    for k in (k1, k2):
        np.asarray(fns[k]().ravel()[-1:])
    best = []
    for _ in range(repeats):
        ts = {}
        for k in (k1, k2):
            t0 = time.perf_counter()
            np.asarray(fns[k]().ravel()[-1:])
            ts[k] = time.perf_counter() - t0
        best.append((ts[k2] - ts[k1]) / (k2 - k1))
    return min(best)


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "3840x2160"
    w, h = map(int, size.split("x"))

    import jax
    import jax.numpy as jnp
    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.frame import split_chroma
    from mpv_frame_interpolator_tpu.ops import flow as F

    geom = F.FlowGeometry.create(h, w, w)
    lh, lw = geom.low_h, geom.low_w
    layers = 16
    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    f1, f2, _ = list(synthetic.gradient_pan(cfg, 3, vx=3, vy=1))
    a1 = [jnp.asarray(x) for x in (f1.y, *split_chroma(f1.uv))]
    a2 = [jnp.asarray(x) for x in (f2.y, *split_chroma(f2.uv))]
    stacks = jax.jit(lambda p, q, r: F._phase_stacks(geom, p, q, r))(*a1)
    jax.block_until_ready(stacks)
    probe = jax.jit(lambda p, q, r: F._subsampled_f2(geom, p, q, r))(*a2)
    jax.block_until_ready(probe)

    rng = np.random.default_rng(0)

    def field(D):
        """(lh, lw) int32 committed field with ~D distinct values,
        2x2-block-constant."""
        vals = rng.integers(-40, 40, D)
        pick = rng.integers(0, D, ((lh + 1) // 2, (lw + 1) // 2))
        f = vals[pick].repeat(2, 0).repeat(2, 1)[:lh, :lw]
        return jnp.asarray(f.astype(np.int32))

    adj_flat = jnp.asarray(
        [(i % layers) - layers // 2 for i in range(layers)], jnp.int32)
    adj_flat = jnp.where(adj_flat > 0, adj_flat * adj_flat,
                         -(adj_flat * adj_flat))

    print(f"{w}x{h} low {lh}x{lw} layers {layers}")

    # ---- phase stacks (once per pair) ----
    def mk_stacks():
        def body(c, _):
            s = F._phase_stacks(geom, a1[0] + c.astype(jnp.uint8),
                                a1[1], a1[2])
            dep = sum(jnp.sum(p, dtype=jnp.uint32) for p in s)
            return dep.astype(jnp.int32), dep
        return body
    print(f"  phase stacks (per pair): "
          f"{chained_time(mk_stacks)*1e3:7.3f} ms")

    # ---- distinct extraction (per step) ----
    offy, offx = field(6), field(6)

    def mk_extract():
        def body(c, _):
            ob = offy + (c & 3)          # real per-iteration input change
            key_b, vals, D, ex = F._distinct_base_offsets(ob, offx, F._FLOW_K)
            dep = jnp.sum(vals) + jnp.sum(key_b, dtype=jnp.int32) + D
            return dep, dep
        return body
    print(f"  distinct extract      : "
          f"{chained_time(mk_extract)*1e3:7.3f} ms/step")

    # ---- delta sampling for several D ----
    for D in (1, 4, 8, 12):
        oy, ox = field(D), field(D)

        def mk_sample():
            def body(c, _):
                ob = oy + (c & 1)        # shifts every distinct value
                key_b, vals, Dt, ex = F._distinct_base_offsets(
                    ob, ox, F._FLOW_K)
                delta = F._delta_layers_shift(
                    geom, stacks, key_b, vals, Dt, adj_flat,
                    jnp.int32(0), layers, probe)
                dep = jnp.sum(delta, dtype=jnp.int32)
                return dep, dep
            return body
        t = chained_time(mk_sample) * 1e3
        print(f"  extract+sample D={D:2d}  : {t:7.3f} ms/step")

    # ---- commit branch (nb + block sum + argmin + commit) ----
    partial0 = jnp.asarray(
        rng.integers(0, 1 << 20, (layers, lh, lw)).astype(np.uint32))
    prev = field(6)
    probe_l = jnp.asarray(
        rng.integers(-64, 64, (layers, lh, lw)).astype(np.int32))
    for wdw, nb in ((256, False), (32, True), (2, True)):
        br = F._make_commit_branch(wdw, nb, layers, lh, lw)

        def mk_commit():
            def body(c, _):
                adj2 = br(partial0 + c.astype(jnp.uint32), prev + c,
                          probe_l, jnp.int32(6), jnp.int32(16))
                dep = jnp.sum(adj2, dtype=jnp.int32)
                return dep, dep
            return body
        print(f"  commit w={wdw:3d} nb={int(nb)}   : "
              f"{chained_time(mk_commit)*1e3:7.3f} ms/step")

    # ---- elementwise partial0 (delta scale + offset bias) ----
    delta_i = jnp.asarray(
        rng.integers(0, 765, (layers, lh, lw)).astype(np.int32))

    def mk_elem():
        def body(c, _):
            d = (delta_i + c).astype(jnp.uint32) << jnp.uint32(8)
            p = d + jnp.abs(probe_l).astype(jnp.uint32)
            dep = jnp.sum(p, dtype=jnp.uint32).astype(jnp.int32)
            return dep, dep
        return body
    print(f"  elementwise partial   : "
          f"{chained_time(mk_elem)*1e3:7.3f} ms/step")

    # ---- gather fallback delta, for contrast ----
    def mk_gather():
        cyg, cxg = jnp.mgrid[0:lh, 0:lw]
        scx = (cxg << geom.res_scalar).astype(jnp.int32)
        scy = (cyg << geom.res_scalar).astype(jnp.int32)
        oy, ox = field(6), field(6)

        def body(c, _):
            cand_x = ox[None] + adj_flat[:, None, None] + (c & 3)
            cand_y = jnp.broadcast_to(oy[None], (layers, lh, lw))
            ncx = F.mirror_inside(scx[None] + cand_x, geom.stride)
            ncy = F.mirror_inside(scy[None] + cand_y, geom.height)
            y1 = F._gather(a1[0], ncy, ncx).astype(jnp.int32)
            d = jnp.abs(y1 - probe[0][None])
            dep = jnp.sum(d, dtype=jnp.int32)
            return dep, dep
        return body
    print(f"  gather delta (y only) : "
          f"{chained_time(mk_gather, k1=2, k2=6)*1e3:7.3f} ms/step")
    return 0


if __name__ == "__main__":
    sys.exit(main())
