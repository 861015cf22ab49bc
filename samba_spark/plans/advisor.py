"""Plan advisor — the anti-pattern scan from SCALE.md as a callable.

``advise(df)`` inspects the physical plan and returns one finding per
detected scale hazard, each with the rule name, the evidence line, and
the remediation this repo already ships. The rules are exactly the ones
the per-round plan audit applies by hand:

- ``cartesian``            — CartesianProduct / BroadcastNestedLoopJoin on
                             the data path (only small declared cross
                             joins should ever show these)
- ``single_partition``     — Exchange SinglePartition: a stage funnels
                             every row through one task (global window /
                             global sort smell; the two-pass
                             partition-offset schemes in relational.py /
                             packing.py are the fix)
- ``python_row_udf``       — BatchEvalPython: a row-at-a-time Python UDF
                             in the plan; move to pandas_udf / built-ins
- ``unpushed_filter``      — a Filter node above a scan whose
                             PushedFilters is empty: the predicate shape
                             defeats pushdown (casts/UDFs over the column)
- ``wide_scan``            — a scan reading > ``wide_scan_cols`` columns:
                             missing projection pruning

The advisor reads the SAME plan strings the plan tests assert on —
purely driver-side, no job. It is a diagnostic, not a gate: e.g. the
#days-row carry ladder in sessionize.concurrency_profile legitimately
plans an Exchange SinglePartition over a metadata-sized input, so
findings carry evidence for a human (or a test) to adjudicate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from samba_spark.plans.inspect import plan_string, plan_summary


@dataclass
class Finding:
    rule: str
    evidence: str
    advice: str


def advise(df: DataFrame, wide_scan_cols: int = 24) -> list[Finding]:
    simple = plan_string(df, "simple")
    s = plan_summary(df)
    findings: list[Finding] = []

    for pat, name in (
        (r"CartesianProduct", "cartesian"),
        (r"BroadcastNestedLoopJoin", "cartesian"),
    ):
        for m in re.finditer(pat + r"[^\n]*", simple):
            findings.append(
                Finding(
                    name,
                    m.group(0).strip()[:160],
                    "nested-loop join on the data path: add an equi-key, "
                    "broadcast the small side explicitly, or block/bucket "
                    "the pairs (dedup.py / simsearch.py patterns)",
                )
            )

    for m in re.finditer(r"Exchange SinglePartition[^\n]*", simple):
        findings.append(
            Finding(
                "single_partition",
                m.group(0).strip()[:160],
                "a stage funnels all rows through one task — if the input "
                "is data-sized, replace the global window/sort with the "
                "two-pass partition-offset scheme (relational.zip_with_index, "
                "sessionize.concurrency_profile)",
            )
        )

    for m in re.finditer(r"BatchEvalPython[^\n]*", simple):
        findings.append(
            Finding(
                "python_row_udf",
                m.group(0).strip()[:160],
                "row-at-a-time Python UDF: rewrite with built-in "
                "pyspark.sql.functions or an Arrow-batched pandas_udf "
                "(10-100x)",
            )
        )

    if re.search(r"\bFilter\b", simple) and s["pushed_filters"] and all(
        not p.strip() for p in s["pushed_filters"]
    ):
        findings.append(
            Finding(
                "unpushed_filter",
                f"PushedFilters: {s['pushed_filters']}",
                "a Filter exists but nothing reached the scan: avoid "
                "wrapping the filtered column in casts/UDFs, or filter on "
                "the stored representation",
            )
        )

    for schema in s["read_schemas"]:
        ncols = schema.count(":")
        if ncols > wide_scan_cols:
            findings.append(
                Finding(
                    "wide_scan",
                    f"{ncols} columns: {schema[:140]}",
                    "scan reads more columns than any projection needs — "
                    "select the needed columns before wide operators so "
                    "pruning reaches the reader",
                )
            )
    return findings
