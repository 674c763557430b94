#!/usr/bin/env python
"""On-device parity report: the running backend vs the NumPy oracle.

Runs the full flow+warp matrix on whatever JAX backend is active (TPU by
default in this environment) and prints a table of bit-exactness results --
the runnable counterpart of the golden test suite, for verifying the
*hardware* path rather than the CPU path.  The check itself lives in
mpv_frame_interpolator_tpu/utils/parity.py (bench.py runs a smoke subset
of it every round).

    PYTHONPATH=.:$PYTHONPATH python tools/parity_report.py
"""

import sys

from mpv_frame_interpolator_tpu.utils.parity import (
    FULL_CASES, MODE_NAMES, run_parity)


def run():
    import jax
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    rows = run_parity(FULL_CASES, modes=tuple(MODE_NAMES))
    width = max(len(r[0]) for r in rows) + 2
    fails = 0
    for name, ok in rows:
        print(f"{name:<{width}} {'BIT-EXACT' if ok else 'MISMATCH'}")
        fails += 0 if ok else 1
    print(f"\n{len(rows) - fails}/{len(rows)} bit-exact vs oracle")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(run())
