"""Quick end-to-end verify per .claude/skills/verify/SKILL.md.

Covers the three surfaces from OUTSIDE the repo cwd: (1) driver
contract — entry() rows, queries()/oracle_sql() key agreement, a
DuckDB spot-sample at sf0.01; (2) bench CLI JSON shape (subset run);
(3) provenance store round-trip. Exit 0 = all green.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SPOT = [
    "q23_star_join",
    "x3_minhash_lsh_dedup",
    "x162_exact_substring_keep_one",
    "x165_incremental_sessionize",
]


def main() -> int:
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    spot = sys.argv[1:] or SPOT
    os.chdir("/tmp")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("verify_quick")
        .getOrCreate()
    )
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) == 10, f"entry(): expected 10 rows, got {len(rows)}"
    print("entry(): 10 rows OK")

    qs, osql = e.queries(), e.oracle_sql()
    extra = set(osql) - set(qs)
    assert not extra, f"oracle keys without queries: {extra}"
    print(f"queries={len(qs)} oracles={len(osql)} key-sets OK")

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype.kind == "f":
                df[c] = df[c].round(6)
        return (
            df.sort_values(list(df.columns))
            .reset_index(drop=True)
            .astype(str)
        )

    for name in spot:
        sdf = qs[name](spark, sf).toPandas()
        if name not in osql:
            print(f"{name}: rows-only ({len(sdf)} rows) OK")
            continue
        odf = con.execute(osql[name]).df()
        a, b = canon(sdf), canon(odf)
        assert list(a.columns) == list(b.columns), (
            f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
        )
        assert a.equals(b), f"{name}: value mismatch ({len(a)} vs {len(b)})"
        print(f"{name}: oracle match ({len(a)} rows) OK")

    # provenance store round-trip
    from samba_spark.session import ProvSession

    with tempfile.TemporaryDirectory() as tmp:
        ps = ProvSession(spark, prov_dir=tmp)
        from pyspark.sql import functions as F

        wrapped = ps.read_parquet(f"{sf}/nation.parquet").with_elements()
        wrapped.filter(F.col("n_regionkey") == 0).select(
            "n_name"
        ).persist_elements()
        ps.stop()
        for d in ("executions", "tasks", "task_deps", "elements",
                  "element_deps"):
            assert os.path.isdir(f"{tmp}/{d}"), f"prov dir missing: {d}"
    print("provenance store OK")

    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--only",
         ",".join(spot[:2]), "--skip-overhead", "--skip-preflight",
         "--out", f"/tmp/verify_quick_bench_{os.getpid()}.json",
         "--force"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    line = out.stdout.strip().splitlines()[-1]
    j = json.loads(line)
    assert {"metric", "value", "unit", "queries", "sf"} <= set(j), j.keys()
    print(f"bench CLI OK ({j['value']} {j['unit']})")
    print("VERIFY_QUICK: ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
