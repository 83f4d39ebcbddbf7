#!/usr/bin/env python
"""CPU-steal calibration (round-11 decay root-cause): measure
hypervisor steal at idle and under synthetic pure-userspace spin at
several widths. If steal ~0 idle but rises with OUR width, the host
grants fewer effective cores than /proc/cpuinfo advertises (a quota —
engine-actionable: size local[N] to effective cores). If steal is
high regardless / comes and goes at fixed width, it is a noisy
neighbor — environmental, affects any engine on this box equally.

No Spark involved: multiprocessing spinners only.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def cpu_times() -> dict:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    hz = os.sysconf("SC_CLK_TCK")
    return {n: int(v) / hz for n, v in zip(names, parts[1:9])}


def window(seconds: float) -> dict:
    a = cpu_times()
    time.sleep(seconds)
    b = cpu_times()
    tot = sum(b.values()) - sum(a.values())
    return {k: round((b[k] - a[k]) / tot, 4) for k in a}


def _spin(stop_at: float) -> None:
    x = 1.0
    while time.time() < stop_at:
        x = x * 1.0000001 % 97.0


def spin_window(width: int, seconds: float) -> dict:
    stop = time.time() + seconds
    procs = [mp.Process(target=_spin, args=(stop,)) for _ in range(width)]
    for p in procs:
        p.start()
    w = window(seconds)
    for p in procs:
        p.join()
    return w


def main() -> None:
    out = {"ncpu": os.cpu_count(), "runs": []}
    for label, width in [("idle", 0), ("spin8", 8), ("spin16", 16),
                         ("spin24", 24), ("spin32", 32), ("idle2", 0)]:
        w = spin_window(width, 6.0) if width else window(6.0)
        rec = {"label": label, "width": width, **w}
        out["runs"].append(rec)
        print(f"{label:7s} steal={w['steal']:.1%} user={w['user']:.1%} "
              f"sys={w['system']:.1%} idle={w['idle']:.1%}",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
