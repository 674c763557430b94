#!/usr/bin/env python
"""Offline decoder for tools/segv_backtrace.c dumps: scan the raw stack
words for values that land in an r-xp mapping (candidate return
addresses), resolve each to lib+offset, and symbolize via nm when the
library has symbols.

    python tools/segv_scan.py /tmp/segv_r5run3.log [--max 40]
"""

import bisect
import re
import subprocess
import sys


def main():
    path = sys.argv[1]
    max_hits = int(sys.argv[sys.argv.index("--max") + 1]) \
        if "--max" in sys.argv else 60
    text = open(path, "rb").read().decode("latin-1")
    m = re.search(r"--- stack words.*?---\n(.*?)\n--- /proc/self/maps ---\n"
                  r"(.*?)--- end maps ---", text, re.S)
    if not m:
        print("no dump block found")
        return 1
    words = [int(t, 16) for t in re.findall(r"0x[0-9a-f]{16}", m.group(1))]
    exec_maps = []
    for ln in m.group(2).splitlines():
        parts = ln.split()
        if len(parts) >= 6 and "x" in parts[1]:
            lo, hi = (int(x, 16) for x in parts[0].split("-"))
            off = int(parts[2], 16)
            exec_maps.append((lo, hi, off, parts[5]))
        elif len(parts) == 5 and "x" in parts[1]:
            lo, hi = (int(x, 16) for x in parts[0].split("-"))
            exec_maps.append((lo, hi, int(parts[2], 16), "[anon-exec]"))
    exec_maps.sort()
    los = [e[0] for e in exec_maps]

    sym_cache = {}

    def symbols(lib):
        if lib not in sym_cache:
            syms = []
            for cmd in (["nm", "-D", "--defined-only", lib],
                        ["nm", "--defined-only", lib]):
                try:
                    out = subprocess.run(cmd, capture_output=True,
                                         text=True, timeout=60).stdout
                except Exception:
                    continue
                for ln in out.splitlines():
                    p = ln.split()
                    if len(p) >= 3 and p[1] in "TtWw":
                        syms.append((int(p[0], 16), p[2]))
            syms.sort()
            sym_cache[lib] = syms
        return sym_cache[lib]

    hits = 0
    for i, w in enumerate(words):
        j = bisect.bisect_right(los, w) - 1
        if j < 0:
            continue
        lo, hi, off, lib = exec_maps[j]
        if not (lo <= w < hi):
            continue
        vaddr = w - lo + off
        sym = ""
        if lib.startswith("/"):
            syms = symbols(lib)
            k = bisect.bisect_right([s[0] for s in syms], vaddr) - 1
            if k >= 0 and vaddr - syms[k][0] < 0x20000:
                sym = f" {syms[k][1]}+{vaddr - syms[k][0]:#x}"
        print(f"sp+{8*i:#06x} {w:#x} -> {lib}+{vaddr:#x}{sym}")
        hits += 1
        if hits >= max_hits:
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
