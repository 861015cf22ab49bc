"""Driver-environment replica: every query must run in a PLAIN
SparkSession whose process cwd is OUTSIDE the repo (the driver's shape).

In that environment executor Python workers cannot import samba_spark, so
any mapInPandas/UDF closure that references a module-level function gets
pickled BY REFERENCE and dies with ModuleNotFoundError on the worker —
invisible to the normal suite (whose cwd puts the repo on worker
sys.path). Factory-built functions serialize by value and survive; this
test pins that property for the whole query surface (the x44 round-3
regression class)."""

import os
import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("plain_session_gate")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
failures = []
for name, fn in e.queries().items():
    try:
        fn(spark, {sf!r}).write.format("noop").mode("overwrite").save()
    except Exception as ex:
        failures.append((name, f"{type(ex).__name__}: {ex}"))
for name, err in failures:
    print(f"PLAIN-SESSION FAIL {name}: {err[:300]}", flush=True)
print(f"RESULT {len(failures)} failures", flush=True)
sys.exit(1 if failures else 0)
"""


def test_all_queries_run_in_plain_session(tmp_path, sf_smoke):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "plain_driver.py"
    script.write_text(
        _SCRIPT.replace("{repo!r}", repr(repo)).replace("{sf!r}", repr(sf_smoke))
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),  # NOT the repo — workers must not see it
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, (
        "queries failed in the driver's plain-session environment:\n"
        + "\n".join(
            l for l in proc.stdout.splitlines() if "PLAIN-SESSION" in l or l.startswith("RESULT")
        )
    )


def test_prov_session_sql_entry_point(spark, sf_smoke, tmp_path):
    """ProvSession.sql: a SQL-authored pipeline is a first-class
    provenance source — task row recorded with the query text, wrapped
    result chains into instrumented operators, and column lineage
    resolves through the SQL."""
    from pyspark.sql import functions as F

    from samba_spark.session import ProvSession

    spark.read.parquet(f"{sf_smoke}/nation.parquet").createOrReplaceTempView(
        "v_nation"
    )
    ps = ProvSession(spark, name="sql_entry", prov_dir=str(tmp_path / "p"))
    try:
        df = ps.sql(
            "SELECT n_regionkey, COUNT(*) AS n FROM v_nation GROUP BY n_regionkey"
        )
        out = df.where(F.col("n") > 0)
        assert out.count() == 5
        lineage = {
            (r.out_col, r.src_col)
            for r in out.column_lineage().collect()
        }
        assert ("n_regionkey", "n_regionkey") in lineage
        tasks = ps.store.table("tasks")
        assert (
            tasks.where(F.col("transformation_type") == "sql").count() == 1
        )
    finally:
        ps.stop()
