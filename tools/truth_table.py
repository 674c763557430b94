#!/usr/bin/env python
"""Measure the docs' chip-bound truth table in one run (VERDICT r4 #3).

Every config from README.md / ARCHITECTURE.md §3 / CLAUDE.md's
current-truth block, measured with the SHIPPED EngineConfig defaults
(warp_sampling/flow_kernel resolve inside utils/chiptime) on the real
chip, written incrementally as JSONL so a sick tunnel can't lose rows:

    PYTHONPATH=.:/root/.axon_site python tools/truth_table.py \
        [--out /tmp/truth_r5.jsonl] [--only LABEL-SUBSTR]

The harness is the hardened scan-chained chip timer (utils/chiptime:
perturbed real inputs + full-output-sum carry each iteration;
(t(K2)-t(K1))/(K2-K1) cancels dispatch/readback fixed costs).
"""

import json
import sys
import time

CONFIGS = [
    # label, kwargs for chip_pair_seconds
    ("640x360 24->72 (3 out/pair)",
     dict(width=640, height=360, n_outputs=3)),
    ("1080p 24->60 (3 out/pair)",
     dict(width=1920, height=1080, n_outputs=3)),
    ("4K 24->120 (5 out/pair, headline)",
     dict(width=3840, height=2160, n_outputs=5)),
    ("8K 24->60 (3 out/pair)",
     dict(width=7680, height=4320, n_outputs=3)),
    ("4K hopperx", dict(model="hopperx")),
    ("4K hopperq", dict(model="hopperq")),
    ("4K hopperxq", dict(model="hopperxq")),
    ("4K P010 10-bit", dict(p010=True)),
]


def main():
    out_path = "/tmp/truth_r5.jsonl"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    from mpv_frame_interpolator_tpu.utils.chiptime import chip_pair_seconds

    rows = []
    for label, kw in CONFIGS:
        if only and only not in label:
            continue
        t0 = time.time()
        try:
            sec = chip_pair_seconds(**kw)
            n = kw.get("n_outputs", 5)
            row = {"label": label, "chip_ms_per_pair": round(sec * 1e3, 2),
                   "out_fps_chip": round(n / sec, 1),
                   "n_outputs": n, "wall_s": round(time.time() - t0, 1),
                   **{k: v for k, v in kw.items()
                      if k in ("model", "p010", "width", "height")}}
        except Exception as e:  # record, keep going
            row = {"label": label, "error": repr(e)[:300],
                   "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
