"""Arrow-native Python boundary operators (mapInArrow / applyInArrow).

When Python logic is unavoidable, the cost ladder is: row-at-a-time UDF
(worst) → Pandas UDF (Arrow transfer + pandas conversion) → **Arrow-native
UDF** (this module): the function receives ``pyarrow.RecordBatch``/
``Table`` objects directly, so there is no pandas materialization at all —
``pyarrow.compute`` kernels run vectorized C++ over the same buffers Spark
already shipped. For pure column math this is the lowest-overhead Python
boundary Spark offers (Spark 4: DataFrame.mapInArrow, cogrouped
applyInArrow).

All worker-bound functions are built by factories so cloudpickle ships
them BY VALUE (the repo-wide plain-session rule): executors never need
samba_spark on PYTHONPATH.

The reference's only Python-boundary story is the RDD pipe; these are
north-star surface beyond parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _make_text_stats_fn():
    import pyarrow as pa
    import pyarrow.compute as pc

    def text_stats(batches):
        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            doc_id = b.column(b.schema.get_field_index("doc_id"))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_id,
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                ],
                names=["doc_id", "n_chars", "n_spaces"],
            )

    return text_stats


def arrow_text_stats(documents: DataFrame) -> DataFrame:
    """Per-document character and space counts computed by
    ``pyarrow.compute`` kernels over zero-copy RecordBatches — no pandas
    object ever exists. Zero shuffle: a projection over the scan, the
    Python boundary is the only cost (one Arrow IPC hop per batch)."""
    return documents.select("doc_id", "text").mapInArrow(
        _make_text_stats_fn(), "doc_id long, n_chars long, n_spaces long"
    )


def _make_cogroup_counts_fn():
    import pyarrow as pa
    import pyarrow.compute as pc

    def cogroup_counts(key, left, right):
        cents = (
            pc.sum(
                pc.cast(
                    pc.round(
                        pc.multiply(
                            pc.cast(right.column("o_totalprice"), pa.float64()),
                            pa.scalar(100.0),
                        )
                    ),
                    pa.int64(),
                )
            ).as_py()
            if right.num_rows
            else 0
        )
        return pa.Table.from_pydict(
            {
                "user_id": [key[0].as_py()],
                "n_events": [left.num_rows],
                "n_orders": [right.num_rows],
                "order_cents": [cents or 0],
            }
        )

    return cogroup_counts


def arrow_cogroup_counts(
    events: DataFrame, orders: DataFrame, restrict_to_left_keys: bool = False
) -> DataFrame:
    """Cogrouped applyInArrow: per user, event count vs order count and
    integer-cents order volume — both sides of the cogroup arrive as raw
    ``pyarrow.Table``s per key (either may be empty: full-outer
    semantics). One shuffle per side on the key, the per-key Python call
    touches only that key's rows — the arbitrary-logic escape hatch when
    a join + aggregate cannot express the pairing (here it could; the
    operator exists to cover and test the API surface at exact-integer
    parity).

    Cost model: one Python invocation PER KEY — the key cardinality, not
    the row count, dominates when groups are small. Feed it a bounded,
    relevant key space: ``restrict_to_left_keys=True`` broadcast-semi-
    joins the right side down to keys present on the left (10× fewer
    calls on the fixture, where most order custkeys never appear in
    events). Unbounded sparse key spaces belong in a join + aggregate,
    not a Python cogroup."""
    from pyspark.sql import functions as F

    ev = events.select(events["user_id"], events["event_id"])
    od = orders.select(
        orders["o_custkey"].alias("user_id"), orders["o_totalprice"]
    )
    if restrict_to_left_keys:
        od = od.join(
            F.broadcast(ev.select("user_id").distinct()), "user_id", "left_semi"
        )
    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInArrow(
            _make_cogroup_counts_fn(),
            "user_id long, n_events long, n_orders long, order_cents long",
        )
    )
