"""Public scalar/column-function surface of the engine.

The reference's scalar story is "whatever the host language lambda does"
(opaque JVM closures, SURVEY.md §2.3); ours is the full Catalyst function
catalog — `pyspark.sql.functions` is the supported API, nothing wrapped or
hidden. This module re-exports the engine's OWN column-level primitives so
users reach them from one namespace:

    from samba_spark import functions as SF
    df.select(SF.cosine("a", "b"), SF.md5_base32("text"))

Everything here is a pure Column expression (whole-stage-codegen'd, no
Python in the data path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from samba_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    _md5_base32,
    _normalized,
)
from samba_spark.operators.simsearch import _dot, _norm, cosine
from samba_spark.operators.textual import tokens_col


def md5_base32(col) -> Column:
    """32-bit integer from the first 8 hex chars of md5(col) — the
    oracle-reproducible base hash (identical in DuckDB via
    ('0x' || substr(md5(x),1,8))::BIGINT)."""
    return _md5_base32(F.col(col) if isinstance(col, str) else col)


def minhash_permute(base: Column, j: int) -> Column:
    """j-th universal-hash permutation h_j(x) = (A_j*x + B_j) mod 2^61-1
    of a 32-bit base hash; all arithmetic signed-64-safe."""
    return (F.lit(MINHASH_A[j]) * base + F.lit(MINHASH_B[j])) % F.lit(MINHASH_P)


def normalized_text(col) -> Column:
    """Whitespace-collapsed, lower-cased, trimmed text — the engine's
    canonical normalization (dedup, fingerprints)."""
    return _normalized(F.col(col) if isinstance(col, str) else col)


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ in double precision, strictly left-to-right."""
    return _dot(
        F.col(a) if isinstance(a, str) else a,
        F.col(b) if isinstance(b, str) else b,
    )


def l2_norm(a) -> Column:
    """Euclidean norm of an array column."""
    return _norm(F.col(a) if isinstance(a, str) else a)


def cosine_sim(a, b) -> Column:
    """Cosine similarity of two array columns."""
    return cosine(
        F.col(a) if isinstance(a, str) else a,
        F.col(b) if isinstance(b, str) else b,
    )


def whitespace_tokens(col) -> Column:
    """Lower-cased whitespace tokens, empty-safe."""
    return tokens_col(F.col(col) if isinstance(col, str) else col)


__all__ = [
    "md5_base32",
    "minhash_permute",
    "normalized_text",
    "dot",
    "l2_norm",
    "cosine_sim",
    "whitespace_tokens",
    "MINHASH_A",
    "MINHASH_B",
    "MINHASH_P",
]
