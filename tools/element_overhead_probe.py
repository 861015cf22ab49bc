#!/usr/bin/env python
"""One idle-machine element-capture overhead triple (VERDICT r8 item 6):
the same scan→filter→project capture pipeline at 1× / 10× / 100× input
rows (~1.5 M / 15 M / 150 M orders rows at sf0.1). The r7/r8 methodology
note predicts the ratio keeps FALLING as real per-row work grows
relative to the two fixed parquet-append job latencies; the 100× point
pins the asymptote so the ≤2× budget conversation stops re-litigating
the 1× denominator every round. Run from the repo root, idle machine:

    python tools/element_overhead_probe.py

Prints one JSON line; paste into BASELINE.md's round-9 section.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import measure_element_overhead
    from samba_spark.session import get_spark

    spark = get_spark(app_name="element_overhead_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for rep in (1, 10, 100):
        out[f"element_overhead_ratio_{rep}x"] = measure_element_overhead(
            spark, sf_dir, replicate=rep
        )
    out["sf_dir"] = sf_dir
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
