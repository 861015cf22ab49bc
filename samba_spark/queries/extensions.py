"""Extension-operator query surface (north-star ops over documents/
embeddings fixtures). Oracle-checked where DuckDB can express the identical
computation (md5/sha256/regex/list functions); hash-family ops (xxhash64
minhash/simhash) and seeded-LSH ops get rows-only checks — deterministic,
but DuckDB has no xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from samba_spark.operators import dedup as D
from samba_spark.operators import simsearch as S
from samba_spark.operators import textual as X
from samba_spark.operators import multimodal as M
from samba_spark.queries.declared import QuerySpec
from samba_spark.sources.tables import load_tables


def _docs(spark, sf_dir) -> DataFrame:
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def _embs(spark, sf_dir) -> DataFrame:
    return load_tables(spark, sf_dir, ["embeddings"])["embeddings"]


# -- dedup -----------------------------------------------------------------
def x_dedup_exact(spark, sf_dir):
    return D.dedup_exact(_docs(spark, sf_dir)).orderBy("keep_doc_id")


X_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(text) ORDER BY keep_doc_id
"""


def x_dedup_normalized(spark, sf_dir):
    return D.dedup_normalized(_docs(spark, sf_dir)).orderBy("keep_doc_id")


X_DEDUP_NORM_SQL = r"""
SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_dups
FROM documents
GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
ORDER BY keep_doc_id
"""


def x_minhash_lsh_dedup(spark, sf_dir):
    """Fuzzy dedup clusters (rows-only check: xxhash64 family)."""
    return D.minhash_lsh_dedup(_docs(spark, sf_dir)).orderBy("doc_id")


def x_simhash(spark, sf_dir):
    """64-bit SimHash signatures (rows-only check)."""
    return D.simhash(_docs(spark, sf_dir)).orderBy("doc_id")


def x_ngram_jaccard(spark, sf_dir):
    """LSH candidates verified by exact 3-gram Jaccard (rows-only check)."""
    docs = _docs(spark, sf_dir)
    pairs = D.lsh_candidate_pairs(docs)
    return (
        D.ngram_jaccard_pairs(docs, pairs)
        .where(F.col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    )


# -- text analysis ---------------------------------------------------------
def x_text_stats(spark, sf_dir):
    return X.text_stats(_docs(spark, sf_dir)).orderBy("doc_id")


_STOP = "[" + ",".join(f"'{w}'" for w in X.STOPWORDS) + "]"

X_TEXT_STATS_SQL = rf"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     x -> x <> '') AS toks,
         length(text) AS n_chars
  FROM documents),
r AS (
  SELECT doc_id, n_chars, len(toks) AS n_words,
         ROUND(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
               / greatest(n_chars, 1), 6) AS punct_ratio,
         ROUND(len(list_filter(toks, w -> list_contains({_STOP}, w)))
               / greatest(len(toks), 1), 6) AS stopword_ratio
  FROM t)
SELECT doc_id,
       n_chars AS n_chars_calc,
       n_words,
       punct_ratio,
       stopword_ratio,
       ROUND(0.5 * least(1.0, n_words / 100.0)
             + 0.3 * (1 - punct_ratio)
             + 0.2 * stopword_ratio, 6) AS quality_score
FROM r ORDER BY doc_id
"""


def x_token_count(spark, sf_dir):
    return X.token_count(_docs(spark, sf_dir)).orderBy("doc_id")


X_TOKEN_COUNT_SQL = rf"""
SELECT doc_id,
       len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                       x -> x <> '')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{X.TOKEN_PATTERN}')) AS bpe_tokens
FROM documents ORDER BY doc_id
"""


def x_lang_id(spark, sf_dir):
    return X.lang_id(_docs(spark, sf_dir)).orderBy("doc_id")


_M = {k: "[" + ",".join(f"'{w}'" for w in v) + "]" for k, v in X.LANG_MARKERS.items()}

X_LANG_ID_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
         len(list_filter(toks, w -> list_contains({_M['en']}, w))) AS s_en,
         len(list_filter(toks, w -> list_contains({_M['es']}, w))) AS s_es,
         len(list_filter(toks, w -> list_contains({_M['fr']}, w))) AS s_fr
  FROM t)
SELECT doc_id, s_en, s_es, s_fr,
       CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM s ORDER BY doc_id
"""


def x_fingerprint(spark, sf_dir):
    return X.fingerprint(_docs(spark, sf_dir)).orderBy("doc_id")


X_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
FROM documents ORDER BY doc_id
"""


# -- similarity search -----------------------------------------------------
def _queries_df(embs: DataFrame) -> DataFrame:
    return embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )


def x_cosine_topk(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    return S.cosine_topk(embs, _queries_df(embs), k=10).orderBy(
        "query_id", "rank"
    )


X_COSINE_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_emb
  FROM embeddings WHERE vec_id < 5),
c AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings),
scored AS (
  SELECT q.query_id, c.vec_id,
         ROUND(list_dot_product(q.q_emb, c.emb) /
               (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
                sqrt(list_dot_product(c.emb, c.emb))), 6) AS sim
  FROM c CROSS JOIN q),
ranked AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, sim, rank FROM ranked
WHERE rank <= 10 ORDER BY query_id, rank
"""


def x_ann_lsh_topk(spark, sf_dir):
    """Approximate NN via random-hyperplane LSH (rows-only check)."""
    embs = _embs(spark, sf_dir)
    return S.lsh_ann_topk(embs, _queries_df(embs), k=10).orderBy(
        "query_id", "rank"
    )


def x_ivf_topk(spark, sf_dir):
    """IVF approximate NN (KMeans coarse quantizer; rows-only check —
    estimator-trained cells are engine-specific)."""
    embs = _embs(spark, sf_dir)
    return S.ivf_topk(embs, _queries_df(embs), k=10).orderBy("query_id", "rank")


def x_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, LSH-bucketed (rows-only check)."""
    return S.embedding_neardup_pairs(_embs(spark, sf_dir)).orderBy(
        "vec_a", "vec_b"
    )


# -- multimodal ------------------------------------------------------------
def x_multimodal_byte_stats(spark, sf_dir):
    """Binary-column plumbing: documents.text as opaque bytes →
    Arrow-batched feature extraction; oracle checks size + sha256."""
    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
    )
    return (
        M.extract_byte_features(media)
        .select("media_id", "n_bytes", "sha256")
        .orderBy("media_id")
    )


X_MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       length(text) AS n_bytes,
       sha256(text) AS sha256
FROM documents ORDER BY media_id
"""


EXTENSIONS: dict[str, QuerySpec] = {
    "x1_dedup_exact": QuerySpec(x_dedup_exact, X_DEDUP_EXACT_SQL),
    "x2_dedup_normalized": QuerySpec(x_dedup_normalized, X_DEDUP_NORM_SQL),
    "x3_minhash_lsh_dedup": QuerySpec(x_minhash_lsh_dedup, None),
    "x4_simhash": QuerySpec(x_simhash, None),
    "x5_ngram_jaccard": QuerySpec(x_ngram_jaccard, None),
    "x6_text_stats": QuerySpec(x_text_stats, X_TEXT_STATS_SQL),
    "x7_token_count": QuerySpec(x_token_count, X_TOKEN_COUNT_SQL),
    "x8_lang_id": QuerySpec(x_lang_id, X_LANG_ID_SQL),
    "x9_fingerprint": QuerySpec(x_fingerprint, X_FINGERPRINT_SQL),
    "x10_cosine_topk": QuerySpec(x_cosine_topk, X_COSINE_TOPK_SQL),
    "x11_ann_lsh_topk": QuerySpec(x_ann_lsh_topk, None),
    "x14_ivf_topk": QuerySpec(x_ivf_topk, None),
    "x12_embedding_neardup": QuerySpec(x_embedding_neardup, None),
    "x13_multimodal_byte_stats": QuerySpec(
        x_multimodal_byte_stats, X_MULTIMODAL_SQL
    ),
}
