"""Single-pass pipeline observability via the Observation API.

``df.observe(Observation, metrics...)`` evaluates aggregate metrics ON THE
ROWS FLOWING THROUGH the plan while some other action runs — the audit
numbers (row counts, null rates, value totals) come for free from the same
scan, instead of a second full pass over the input. At 100 TB a "count the
rows we just wrote" re-query doubles the job cost; an observe node adds a
streaming-aggregate alongside the existing exchange and costs ~nothing.

The reference has no observability surface (metrics are whatever the Spark
UI shows); this is north-star operational tooling for long pipelines.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, metrics: Mapping[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named audit metrics to ``df``'s plan.

    Returns (observed_df, observation). The metrics materialize when the
    FIRST action runs over ``observed_df`` — read them with
    ``observation.get`` after that action. Aliases come from the mapping
    keys."""
    obs = Observation()
    cols = [c.alias(name) for name, c in metrics.items()]
    return df.observe(obs, *cols), obs


def run_audited(
    df: DataFrame,
    metrics: Mapping[str, Column],
    action: Callable[[DataFrame], Any],
) -> tuple[Any, dict]:
    """Run ``action`` over ``df`` with ``metrics`` observed in the same
    pass; returns (action_result, metrics_dict). Typical use::

        result, audit = run_audited(
            big_df,
            {"n_rows": F.count(F.lit(1)),
             "null_keys": F.sum(F.col("k").isNull().cast("long"))},
            lambda d: d.write.parquet(out),
        )
    """
    obs_df, obs = observed(df, metrics)
    result = action(obs_df)
    return result, dict(obs.get)
