#!/usr/bin/env python
"""Localize the Pallas flow step's per-step FIXED cost on the chip.

Scan-chains flow_step_pallas alone (plus the full scan-step branch for
the glue delta), sweeping the knobs that could own the fixed ~0.6
ms/step: the distinct budget K (sequential full-field min-extractions),
the traced radius (DMA + commit loop trip counts), the distinct count D
(DMA loop slope), and the window branch.  Harness rules: every
iteration PERTURBS the committed field and the carry reduces the FULL
output (tools/chip_time.py lessons).

    PYTHONPATH=.:/root/.axon_site python tools/flow_step_pallas_breakdown.py [WxH]
"""

import sys
import time

import numpy as np


def chained_time(make_body, k1=4, k2=20, repeats=2):
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

    import os
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/mfi_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from mpv_frame_interpolator_tpu.io import synthetic
    from mpv_frame_interpolator_tpu.frame import split_chroma
    from mpv_frame_interpolator_tpu.ops import flow as F
    from mpv_frame_interpolator_tpu.ops.pallas import flow_step as FS

    geom = F.FlowGeometry.create(h, w, w)
    lh, lw = geom.low_h, geom.low_w
    rs = geom.res_scalar
    layers = 16
    cfg = synthetic.SyntheticConfig(width=w, height=h, fps=24.0)
    f1, f2, _ = list(synthetic.gradient_pan(cfg, 3, vx=3, vy=1))
    a1 = [jnp.asarray(x) for x in (f1.y, *split_chroma(f1.uv))]
    a2 = [jnp.asarray(x) for x in (f2.y, *split_chroma(f2.uv))]
    stacks = jax.jit(lambda p, q, r: F._phase_stacks(geom, p, q, r))(*a1)
    stacks2 = jax.jit(lambda s: FS.pad_stacks_for_pallas(
        s, lh, lw, F._FLOW_BLOW))(stacks)
    probe = jax.jit(lambda p, q, r: jnp.stack(
        F._subsampled_f2(geom, p, q, r)).astype(jnp.int16))(*a2)
    jax.block_until_ready((stacks2, probe))

    rng = np.random.default_rng(0)

    def field(D):
        vals = rng.integers(-40, 40, D)
        pick = rng.integers(0, D, ((lh + 255) // 256, (lw + 255) // 256))
        f = vals[pick].repeat(256, 0).repeat(256, 1)[:lh, :lw]
        return jnp.asarray(f.astype(np.int32))

    print(f"{w}x{h} low {lh}x{lw} layers {layers}", flush=True)

    def step_body(D, radius, K, window, nb):
        oy, ox = field(D), field(D)
        meta0 = jnp.asarray([0, radius, 6, 2], jnp.int32)

        def mk():
            def body(c, _):
                ob = oy + (c & 1)    # perturbs every distinct value
                adj2, valid = FS.flow_step_pallas(
                    stacks2, probe, ob, ox, meta0,
                    lh=lh, lw=lw, s=1 << rs, rs=rs, Bl=F._FLOW_BLOW,
                    window=window, nb_enabled=nb, layers=layers,
                    luma_shift=0, K=K)
                dep = jnp.sum(adj2, dtype=jnp.int32) + valid[0]
                return dep, dep
            return body
        return mk

    cases = [
        ("base  w=32 nb=1 D=2 R=16 K=12", step_body(2, 16, 12, 32, True)),
        ("radius 5                     ", step_body(2, 5, 12, 32, True)),
        ("K=2                          ", step_body(2, 16, 2, 32, True)),
        ("D=8                          ", step_body(8, 16, 12, 32, True)),
        ("window=256 nb=0              ", step_body(2, 16, 12, 256, False)),
        ("window=2   nb=1              ", step_body(2, 16, 12, 2, True)),
    ]
    for name, mk in cases:
        t0 = time.perf_counter()
        t = chained_time(mk) * 1e3
        print(f"  {name}: {t:7.3f} ms/step "
              f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)

    # full scan-step branch (kernel + cond glue + commit), for the delta
    br = F._make_step_branch(geom, 32, True, layers, 0,
                             a1[0], a1[1], a1[2],
                             tuple(probe.astype(jnp.int32)), stacks,
                             stacks2=stacks2, probe_st=probe)
    oy, ox = field(2), field(2)

    def mk_full():
        def body(c, _):
            ob = oy + (c & 1)
            nx, ny = br(ox, ob, jnp.int32(1), jnp.int32(16),
                        jnp.int32(6), jnp.int32(2))
            dep = (jnp.sum(nx, dtype=jnp.int32)
                   + jnp.sum(ny, dtype=jnp.int32))
            return dep, dep
        return body
    t0 = time.perf_counter()
    t = chained_time(mk_full) * 1e3
    print(f"  full branch w=32 nb=1 (glue) : {t:7.3f} ms/step "
          f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
