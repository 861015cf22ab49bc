"""t2 correctness replica: every declared query hash-matches DuckDB on the
same parquet (BASELINE.md). Runs at sf0.001 for speed; the driver runs the
same comparison at sf0.01."""

import pytest

from samba_spark.queries import ALL_QUERIES, DECLARED
from tests.oracle_util import compare, duckdb_conn

# the driver's gate runs every oracle-bearing query (declared + extras +
# extensions); mirror that here so a parity break fails locally first
ORACLE_QUERIES = [name for name, spec in ALL_QUERIES.items() if spec.oracle]


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duckdb_conn(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_smoke, duck, name):
    spec = ALL_QUERIES[name]
    df = spec.fn(spark, sf_smoke)
    compare(df, duck, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    keys_q = set(e.queries().keys())
    keys_o = set(e.oracle_sql().keys())
    assert keys_o <= keys_q


def test_no_hugeint_oracle_columns(duck):
    """No oracle may produce a HUGEINT / DECIMAL(38,*) (int128) column:
    DuckDB promotes bare SUM(BIGINT) to HUGEINT, which the driver's hasher
    represents differently from BIGINT even when values are identical
    (round-2 q39 hash-fail root cause). Every integer SUM must be wrapped
    in CAST(... AS BIGINT) or ROUND."""
    from samba_spark.queries.extras import seed_q24_oracle_dir

    seed_q24_oracle_dir()  # q24's oracle binds against its prov dir
    for name, spec in ALL_QUERIES.items():
        if not spec.oracle:
            continue
        desc = duck.execute(f"DESCRIBE {spec.oracle}").fetchall()
        for col, typ, *_ in desc:
            t = typ.upper()
            assert "HUGEINT" not in t and not t.startswith("DECIMAL(38"), (
                f"{name}.{col} is {typ}: cast to BIGINT in the oracle SQL"
            )


def test_contract_window_invariant():
    """The driver's correctness artifact records the FIRST 50 entries of
    ALL_QUERIES; CONTRACT_QUERIES must be exactly that prefix, 50 strong.
    Round-11 rotation (VERDICT r10 item 4): the sentinel core, the five
    round-11 additions (new-before-backfill standing policy), and the
    oldest-single-green backfill blocks (x114, the round-6 singles, the
    round-7 singles) must all be in-window."""
    from samba_spark.queries import ALL_QUERIES, CONTRACT_QUERIES

    names = list(ALL_QUERIES)
    assert len(CONTRACT_QUERIES) == 50
    assert names[:50] == list(CONTRACT_QUERIES)
    in_window = set(names[:50])
    sentinels = {
        "q24_provenance_lineage", "q39_training_pipeline", "q41_pagerank",
        "q43_stream_join", "x3_minhash_lsh_dedup",
    }
    assert sentinels <= in_window
    # round-11 additions + representatives of each backfill block
    # (q29/q30/x135 were displaced by the late additions x168/x169/
    # x170 and queue for round 12)
    for x in ("x166", "x167", "x168", "x169", "x170", "x114", "q93",
              "x101", "x14", "q98", "x121", "x134"):
        assert any(n.startswith(f"{x}_") for n in in_window), f"{x} outside window"
