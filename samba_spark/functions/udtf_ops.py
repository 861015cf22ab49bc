"""Python UDTF surface (Spark 4): user-defined TABLE functions — the
row-to-rows third leg of the UDF/UDAF/UDTF triad (SURVEY.md §2.3 "UDF /
UDAF / UDTF surface"; the reference's analogue is an arbitrary flatMap
lambda, rdd/RDD.scala:507).

UDTFs are the *slow path* by design — one Python call per input row — so
the engine uses them only where the expansion logic is genuinely
imperative; everything expressible as explode/sequence/posexplode stays
JVM-side (see operators/chunking.py for the contrast). The one here is
deliberately simple and deterministic so the DuckDB oracle can replay it
exactly (query x72)."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, pos int")
class LeadingTokens:
    """Emit the first ``limit`` (default 10) space-separated tokens of a
    text with their 1-based position. Empty tokens (from repeated spaces)
    consume a position but are not emitted — the exact contract
    ``string_split`` + index gives in SQL, so cross-engine parity holds."""

    def eval(self, text: str, limit: int = 10):  # noqa: D102
        toks = (text or "").split(" ")
        for i, t in enumerate(toks[:limit], start=1):
            if t:
                yield t, i


def register_udtfs(spark) -> None:
    """Register the engine's UDTFs for SQL use (LATERAL table calls)."""
    spark.udtf.register("leading_tokens", LeadingTokens)
