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
    Round-5 rotation (VERDICT r4 item 1): the sentinel core plus 45
    never-driver-checked backlog entries — every round-2/3 residual,
    then the highest-risk round-4 additions — must all be in-window so
    each gets its first hard driver row."""
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
    # Priority families from VERDICT r4 item 1, each pinned in-window.
    residual_x = (
        "x45", "x46", "x47", "x50", "x51", "x52", "x54", "x56", "x57",
        "x58", "x59", "x61", "x62", "x64", "x66", "x67", "x68", "x69",
        "x76", "x78",
    )
    round4_x = (
        "x88", "x89", "x90", "x91", "x92",          # multimodal dedup
        "x95", "x96", "x100", "x107",               # mining / profiling
        "x105", "x114",                              # graph
        "x108", "x109", "x110",                      # event analytics
        "x111", "x112", "x113",                      # dedup at scale
    )
    for x in residual_x + round4_x:
        assert any(n.startswith(f"{x}_") for n in in_window), f"{x} outside window"
    for q in ("q74", "q76", "q87", "q88", "q89", "q90", "q91", "q92"):
        assert any(n.startswith(f"{q}_") for n in in_window), f"{q} outside window"
