#!/usr/bin/env python
"""Honest per-pair CHIP execution time via a scan-chained program.

Why: on this sandbox's relay, per-output sync loops time the dispatch
path (block_until_ready acks early), and opening the readback channel
degrades later dispatches -- so neither can time the chip.  This tool
sidesteps both: ONE program runs the fused interpolation step K times
under lax.scan with a data dependency between iterations (so the K
executions serialize on-chip), and the difference between a K1-run and a
K2-run cancels every fixed cost (dispatch, readback-channel setup, queue
latency):

    pair_time = (t(K2) - t(K1)) / (K2 - K1)

    PYTHONPATH=.:$PYTHONPATH python tools/chip_time.py [WxH] [N_outputs]
"""

import sys

from mpv_frame_interpolator_tpu.utils.chiptime import chip_pair_seconds


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "3840x2160"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    radius = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    w, h = map(int, size.split("x"))
    sec = chip_pair_seconds(w, h, n, radius)
    print(f"{w}x{h} radius{radius} {n} outputs/pair: {sec*1e3:.3f} ms/pair "
          f"= {sec/n*1e6:.0f} us/output = {n/sec:.0f} out-fps chip-bound")
    return 0


if __name__ == "__main__":
    sys.exit(main())
