#!/usr/bin/env python
"""Measure what each candidate degradation lever buys on the chip.

VERDICT r3 missing #1: radius alone buys 1.02x at 4K because after the
Pallas flow step the pair is warp- and fixed-machinery-dominated.  The
honest levers (ARCHITECTURE §3) are pyramid depth (--num-iterations)
and calc resolution (--max-calc-res).  This tool times the fused pair
program for a ladder of (radius, iterations, max_calc_res) states with
the scan-chained harness, so the quality controller's ladder can be
wired to steps that MEASURABLY rescue real-time.

    PYTHONPATH=.:/root/.axon_site python tools/degrade_ladder.py [WxH]
"""

import os
import sys


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "3840x2160"
    w, h = map(int, size.split("x"))

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/mfi_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from mpv_frame_interpolator_tpu.utils.chiptime import chip_pair_seconds

    # (tag, radius, layers, num_iterations (0=full), max_calc_res, model)
    ladder = [
        ("full r16",            16, 16, 0, 270, "hopper"),
        ("r5",                   5,  5, 0, 270, "hopper"),
        ("r5 depth-1",           5,  5, 7, 270, "hopper"),
        ("r5 depth-2",           5,  5, 6, 270, "hopper"),
        ("r5 depth-3",           5,  5, 5, 270, "hopper"),
        ("r5 res/2",             5,  5, 0, 135, "hopper"),
        ("r5 res/2 depth-2",     5,  5, 5, 135, "hopper"),
        # the shipped ladder's middle rung (EngineConfig.degrade_rungs
        # (3,4)): depth-3 at quarter calc-res, still flow-bearing
        ("r5 res/4 depth-3",     5,  5, 5,  67, "hopper"),
        ("blend rung",           5,  5, 5,  67, "blend"),
    ]
    base = None
    for tag, radius, layers, iters, mcr, model in ladder:
        sec = chip_pair_seconds(w, h, 5, radius, model=model, k1=4, k2=12,
                                repeats=1, layers=layers,
                                num_iterations=iters, max_calc_res=mcr)
        if base is None:
            base = sec
        print(f"{tag:18s}: {sec*1e3:8.3f} ms/pair  "
              f"(speedup {base/sec:5.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
