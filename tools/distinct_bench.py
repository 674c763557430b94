#!/usr/bin/env python
"""Honest chip timing: distinct-value detection strategies on low-res
fields (the warp's _distinct_displacements and flow's
_distinct_base_offsets inner loops).

    PYTHONPATH=.:$PYTHONPATH python tools/distinct_bench.py
"""

import sys

import numpy as np

from tools.flow_breakdown import chained_time


def main():
    import jax.numpy as jnp
    from mpv_frame_interpolator_tpu.ops.flow import _distinct_min_extract

    rng = np.random.default_rng(0)
    lh, lw = 270, 480

    for D in (8, 64):
        field = jnp.asarray(
            rng.integers(0, 3000, D)[rng.integers(0, D, (lh, lw))]
            .astype(np.int32))

        for K in (12, 96):
            def mk_extract():
                def body(c, _):
                    vals, Dv, ex = _distinct_min_extract(
                        (field + (c & 3)).ravel(), K)
                    dep = jnp.sum(vals) + Dv
                    return dep, dep
                return body
            print(f"  D={D:3d} extract K={K:3d}: "
                  f"{chained_time(mk_extract)*1e3:7.3f} ms")

        def mk_sort():
            def body(c, _):
                ks = jnp.sort((field + (c & 3)).ravel())
                uniq = jnp.concatenate([jnp.ones((1,), bool),
                                        ks[1:] != ks[:-1]])
                Dv = uniq.sum()
                pos = jnp.cumsum(uniq) - 1
                vals = jnp.full((96,), -1, jnp.int32).at[
                    jnp.where(uniq, pos, 96)].set(ks, mode="drop")
                dep = jnp.sum(vals) + Dv
                return dep, dep
            return body
        print(f"  D={D:3d} sort96 130k   : "
              f"{chained_time(mk_sort)*1e3:7.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
