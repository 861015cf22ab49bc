#!/usr/bin/env python
"""Focused wall + JVM-CPU A/B harness for a handful of declared queries.

Runs each named query K times (noop sink, warm pass first) and prints
per-sample wall seconds, host busy/steal tick deltas, and driver JVM
process-CPU deltas — the same diagnostics bench.py records, isolated so
a code A/B does not need a full 268-query suite per side.

Usage: python tools/ab_probe_family.py <label> <k> q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _host_ticks():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + vals[4]
    steal = vals[7] if len(vals) > 7 else 0
    busy = sum(vals) - idle
    return busy, steal


def main() -> int:
    label, k = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from samba_spark.queries import ALL_QUERIES
    from samba_spark.session import get_spark

    spark = get_spark(app_name=f"ab_{label}")
    spark.sparkContext.setLogLevel("ERROR")
    hz = os.sysconf("SC_CLK_TCK")
    # MXBean getProcessCpuTime is module-blocked on JDK 17 (bench.py
    # note) — read the JVM's utime+stime from /proc instead
    jvm_pid = int(
        spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
    )

    def _jvm_cpu():
        with open(f"/proc/{jvm_pid}/stat") as fh:
            parts = fh.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / hz

    out = {}
    for name in names:
        fn = ALL_QUERIES[name].fn
        # warm pass (codegen, broadcast, file listing)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = {"wall": [], "cpu": [], "steal": [], "jvm_cpu": []}
        for _ in range(k):
            b0, s0 = _host_ticks()
            j0 = _jvm_cpu()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            b1, s1 = _host_ticks()
            j1 = _jvm_cpu()
            samples["wall"].append(round(wall, 3))
            samples["cpu"].append(round((b1 - b0) / hz, 2))
            samples["steal"].append(round((s1 - s0) / hz, 2))
            samples["jvm_cpu"].append(round(j1 - j0, 2))
        out[name] = samples
        med = sorted(samples["wall"])[k // 2]
        print(
            f"{label} {name}: wall_med={med} {json.dumps(samples)}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
