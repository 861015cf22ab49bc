"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in ``pyspark.sql.functions`` expressions —
whole-stage-codegen'd, zero Python in the data path, so a 100 TB documents
scan runs at parquet-scan speed. Each operator has an exact ANSI-SQL
equivalent (see queries/extensions.py) so the DuckDB oracle can check it.

Not present in the reference (its text handling is opaque JVM lambdas —
SURVEY.md §2.3 scalar functions note); these are the north-star extension
operators required by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Shared marker/stopword vocabularies — tiny by design so the SQL oracle can
# inline them. Deterministic heuristic quality, not linguistic accuracy.
STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "on", "for", "it"]
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "les", "et", "des", "un"],
}
# BPE-ish token pattern: letter runs, digit runs, single punctuation marks.
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empty-safe."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != F.lit("")
    )


def text_stats(documents: DataFrame) -> DataFrame:
    """Quality-scoring stats: length, word count, punctuation ratio,
    stopword ratio, composite quality score. One projection — no shuffle."""
    toks = tokens_col(F.col("text"))
    n_chars = F.length("text")
    n_words = F.size(toks)
    punct = F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", ""))
    # Raw IEEE quotients, NOT ROUND(…,6): integer/integer division is
    # bit-identical on every engine, while ROUND of such quotients can land
    # exactly on a decimal half (e.g. 1/640) and flip HALF_UP vs HALF_EVEN.
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_hits = F.size(
        F.filter(toks, lambda w: w.isin(STOPWORDS))
    )
    stop_ratio = stop_hits / F.greatest(n_words, F.lit(1))
    quality = (
        0.5 * F.least(F.lit(1.0), n_words / F.lit(100.0))
        + 0.3 * (1 - punct_ratio)
        + 0.2 * stop_ratio
    )
    return documents.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_calc"),
        n_words.cast("long").alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def quality_keep(text: Column, num: int = 11, den: int = 20) -> Column:
    """Tie-free quality gate: ``quality_score >= num/den`` decided in exact
    integer arithmetic so Spark and any SQL oracle agree bit-for-bit.

    quality = min(W,100)/200 + 3/10·(1 − P/C) + 1/5·(S/T) with
    W=n_words, P=n_punct_chars, C=max(n_chars,1), T=max(n_words,1),
    S=n_stopword_hits. Multiplying the inequality by the positive 200·C·T
    clears every division:

        den·(min(W,100)·C·T + 60·C·T − 60·P·T + 40·S·C) >= 200·num·C·T

    All terms are BIGINT (≤ ~2·10^13 for 100 k-char docs) — no rounding,
    no HALF_UP/HALF_EVEN divergence. Same pattern as the n-gram Jaccard
    threshold (extensions.py x5)."""
    toks = tokens_col(text)
    w = F.size(toks).cast("long")
    c = F.greatest(F.length(text).cast("long"), F.lit(1))
    t = F.greatest(w, F.lit(1))
    p = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")).cast("long")
    s = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))).cast("long")
    min_w = F.least(w, F.lit(100))
    lhs = den * (min_w * c * t + 60 * c * t - 60 * p * t + 40 * s * c)
    return lhs >= (200 * num) * c * t


def quality_keep_sql(
    w: str, c: str, p: str, s: str, num: int = 11, den: int = 20
) -> str:
    """DuckDB boolean expression mirroring :func:`quality_keep` exactly.
    ``w/c/p/s`` name integer columns (word count, char count, punct chars,
    stopword hits) the caller's CTE has already computed — same integer
    arithmetic as the Spark side, so the oracle gate never diverges."""
    C = f"greatest({c}, 1)"
    T = f"greatest({w}, 1)"
    return (
        f"({den} * (least({w}, 100) * {C} * {T}"
        f" + 60 * {C} * {T} - 60 * {p} * {T} + 40 * {s} * {C})"
        f" >= {200 * num} * {C} * {T})"
    )


def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    ws = F.size(tokens_col(F.col("text"))).cast("long")
    bpe = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
    ).cast("long")
    return documents.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """N-gram-free marker-word language heuristic: count marker hits per
    language, argmax with deterministic precedence en > es > fr."""
    toks = tokens_col(F.col("text"))

    def marker_filter(markers):
        # closure factory: a default-arg lambda would have arity 2 and be
        # misread by F.filter as an (element, index) lambda
        return lambda w: w.isin(list(markers))

    scores = {
        lang: F.size(F.filter(toks, marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["es"]) & (scores["en"] >= scores["fr"]), "en"
        )
        .when(scores["es"] >= scores["fr"], "es")
        .otherwise("fr")
    )
    return documents.select(
        "doc_id",
        scores["en"].cast("long").alias("s_en"),
        scores["es"].cast("long").alias("s_es"),
        scores["fr"].cast("long").alias("s_fr"),
        pred.alias("lang_pred"),
    )


def top_terms(documents: DataFrame, k: int = 10, group: str = "source") -> DataFrame:
    """Per-group top-k vocabulary terms by frequency, ties broken by term
    (fully deterministic, integer-only — no float rank exposure).

    Scale shape: explode → groupBy(group, term) runs with map-side partial
    aggregation, so the shuffle carries one row per (group, distinct term)
    per partition, not one per token. The ranking window partitions by
    group over the aggregated vocabulary (|vocab| ≪ corpus), never over
    raw rows."""
    tok = documents.select(
        group, F.explode(tokens_col(F.col("text"))).alias("term")
    )
    counts = tok.groupBy(group, "term").agg(
        F.count(F.lit(1)).cast("long").alias("term_count")
    )
    w = Window.partitionBy(group).orderBy(F.desc("term_count"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ngram_set(documents: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, ngram): distinct word n-grams per document. Tokenization is
    bound to a column before the per-position slice (the O(len²)
    re-evaluation trap — see dedup.shingles). Documents shorter than n
    tokens contribute their full token run, matching the shingle edge
    semantics the x5 oracle already verifies."""
    toked = documents.select(
        "doc_id", tokens_col(F.col("text")).alias("_toks")
    )
    ngs = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, n)),
    )
    return toked.select(
        "doc_id", F.explode(F.array_distinct(ngs)).alias("ngram")
    )


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, n: int = 5
) -> DataFrame:
    """Training-vs-eval n-gram overlap check (decontamination): for every
    corpus document, count distinct word n-grams that also appear anywhere
    in the benchmark set, and flag overlap > 0 as contaminated.

    Scale shape: the benchmark n-gram set is small by nature (eval suites,
    not corpora) and is deduplicated then **broadcast**, so the corpus side
    never shuffles — the contamination probe is a map-side hash join over
    the exploded n-grams followed by one aggregation keyed on doc_id."""
    c_ng = ngram_set(corpus, n)
    b_ng = ngram_set(benchmark, n).select("ngram").distinct()
    hits = (
        c_ng.join(F.broadcast(b_ng), "ngram", "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    return corpus.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText rules):
    per document, total token occurrences, distinct tokens, the modal
    token's count, and the derived duplicate-token / top-token fractions.

    Scale shape: explode → groupBy(doc_id, term) partial-aggregates
    map-side, so the shuffle carries one row per (doc, distinct term) per
    partition; the second aggregation is keyed on doc_id alone. No window
    over raw rows, no per-doc Python. Fractions are raw IEEE quotients of
    integers (bit-identical on any engine — no ROUND tie exposure)."""
    tok = documents.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    per_term = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    agg = per_term.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("cnt").cast("long").alias("top_count"),
    )
    n = F.greatest(F.col("n_tokens"), F.lit(1))
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_count",
        ((F.col("n_tokens") - F.col("n_distinct")) / n).alias("dup_frac"),
        (F.col("top_count") / n).alias("top_frac"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowered text.
    md5 (not xxhash64) so the DuckDB oracle computes the identical digest."""
    normalized = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return documents.select(
        "doc_id", F.md5(normalized).alias("fp")
    )


# Default PII-shaped scrub patterns. Written in the regex subset that Java
# (Spark) and RE2 (DuckDB) interpret identically — character classes,
# quantifiers, alternation; no backrefs, no lookaround — so the oracle
# replays the exact same redaction.
REDACT_PATTERNS: list[tuple[str, str]] = [
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
    (r"[0-9]+", "<NUM>"),
]


# Tracking query params stripped by canonicalize_url — the closed list a
# crawl pipeline actually drops (UTM family + the big ad-click ids). One
# regex alternation so Spark (Java regex) and DuckDB (RE2) agree exactly.
# (=|$) so VALUELESS tracking params ('?utm_source', '?ref') strip too —
# requiring '=' would leave the bare variant in a different dedup group;
# $ cannot over-match here because rlike runs on a single split param
# (no newlines survive the '&' split of a URL query).
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)(=|$)"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of a URL for dedup keys — the crawl-pipeline
    normalization that collapses the dozens of raw variants one page is
    fetched under into ONE group key:

    * fragment dropped (``#...`` is client-side only);
    * scheme + host lowercased (RFC 3986 §6.2.2.1 — path/query stay
      case-sensitive);
    * default port stripped (``:80`` for http, ``:443`` for https);
    * tracking params removed (UTM family, gclid/fbclid/msclkid/mc_eid,
      ref) and the surviving query params SORTED — param order is
      almost always non-semantic, and sorting is what makes the key
      stable across referrers;
    * trailing path slash stripped.

    Pure chained ``regexp_replace``/``filter``/``array_sort`` Catalyst
    expressions — one codegen'd projection, zero shuffle, so a 100 TB
    URL column canonicalizes at scan speed; the identical normalization
    is expressible in DuckDB SQL (x119's oracle replays it)."""
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(c, "#.*$", "")
    base = F.regexp_replace(no_frag, r"\?.*$", "")
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    head = F.lower(F.regexp_extract(base, "^([^/]*//[^/]*)", 1))
    # Strip ONLY the scheme's own default port: a bare otherwise-branch
    # would strip :80 from any scheme (ftp://host:80 would merge with
    # ftp://host, whose default is 21).
    head = F.when(
        head.startswith("https://"), F.regexp_replace(head, ":443$", "")
    ).when(
        head.startswith("http://"), F.regexp_replace(head, ":80$", "")
    ).otherwise(head)
    path = F.regexp_replace(
        F.regexp_replace(base, "^[^/]*//[^/]*", ""), "/$", ""
    )
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        head, path, F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise("")
    )


def url_dedup_groups(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """Group rows by canonical URL: (canonical_url, n_dups, keep_id) with
    keep_id = min id per group — the fetch-dedup step upstream of any
    content dedup. One hash aggregate keyed on the canonical string; the
    canonicalization itself never shuffles."""
    return (
        df.select(
            canonicalize_url(url_col).alias("canonical_url"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min("_id").alias("keep_id"),
        )
    )


def redact(col: Column | str, patterns=None) -> Column:
    """PII/pattern scrub: chained ``regexp_replace`` — one codegen'd
    projection, zero shuffle, so a 100 TB scrub runs at scan speed.
    Patterns apply in declaration order (most specific first: an email is
    redacted as <EMAIL> before its digits could match <NUM>)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, token in patterns or REDACT_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def redaction_stats(
    df: DataFrame, col: str, patterns=None, key: str | None = None
) -> DataFrame:
    """Per-row redacted text + exact char-delta accounting.

    ``n_redacted_chars`` = chars removed net of the replacement tokens
    (length delta) — an integer, engine-exact; ``was_redacted`` gates
    audits/sampling of scrubbed rows."""
    red = redact(F.col(col), patterns)
    keep = [key] if key else [c for c in df.columns if c != col]
    return df.select(
        *keep,
        red.alias(f"{col}_redacted"),
        (F.length(F.col(col)) - F.length(red)).cast("long").alias("char_delta"),
        (F.col(col) != red).alias("was_redacted"),
    )


def salient_terms(
    documents: DataFrame, k: int = 3, scale: int = 1_000_000
) -> DataFrame:
    """Per-document top-k salient terms — the TF-IDF family with an
    integer-exact score so ranking never hinges on float log rounding:

        score_q = (tf · n_docs · scale) div (df · n_tokens_doc)

    i.e. quantized (term freq ÷ doc length) · (N ÷ doc freq) — monotone in
    classic tf-idf for fixed doc, and BIGINT throughout (integer ``div``),
    so Spark and any SQL oracle rank identically. Ties break (term asc).

    Scale shape: tf is a partial-agg groupBy(doc, term); df is a
    partial-agg over distinct (term, doc) pairs, and the result —
    |vocab| rows — is **broadcast** back onto the tf side, so the corpus
    shuffles once on (doc_id, term) and never on raw tokens. n_docs is a
    1-row broadcast cross join. The ranking window partitions by doc over
    ≤ |doc vocab| rows.
    """
    tok = documents.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    doclen = Window.partitionBy("doc_id")
    tf = tf.withColumn("n_tok", F.sum("tf").over(doclen).cast("long"))
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs = documents.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_q",
            F.expr(f"(tf * n_docs * {scale}L) div (df * n_tok)").cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_q"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score_q", "rank")
    )


def length_histogram(
    documents: DataFrame, group: str = "source", col: str = "n_chars"
) -> DataFrame:
    """Corpus length profile: per (group, log2 bucket) doc count and char
    mass. The bucket is ``length(bin(n))`` = floor(log2 n)+1 computed in
    pure integer/string ops — no float log2, whose last-ulp rounding could
    flip a boundary value between engines. One partial-agg groupBy; the
    shuffle carries O(groups × 64) rows."""
    bucket = F.length(F.bin(F.greatest(F.col(col), F.lit(1)))).cast("long")
    return (
        documents.groupBy(group, bucket.alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(col).cast("long").alias("sum_chars"),
            F.min(col).cast("long").alias("min_chars"),
            F.max(col).cast("long").alias("max_chars"),
        )
    )


def collocations(
    documents: DataFrame, top_k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Top-k corpus collocations: word bigrams ranked by frequency, each
    with its component unigram counts — the integer numerators of PMI
    (callers compute log(n_ab·N / (n_a·n_b)) downstream; this operator
    stays integer-exact so results are engine-reproducible).

    Scale shape: one shuffle for bigram counts, one for unigram counts;
    the unigram side joins back onto the top-k bigram rows only (k rows —
    broadcastable), never onto the full bigram table. The top-k itself is
    a TakeOrderedAndProject, not a global sort."""
    toks = documents.select(tokens_col(F.col(text_col)).alias("_toks"))
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size("_toks") - 2, F.lit(0))
                ),
                lambda i: F.struct(
                    F.element_at("_toks", i + 1).alias("w1"),
                    F.element_at("_toks", i + 2).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2").where(F.col("w2").isNotNull())
    top = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .orderBy(F.desc("n_ab"), F.asc("w1"), F.asc("w2"))
        .limit(top_k)
    )
    uni = (
        toks.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        top.join(uni.select(F.col("w").alias("w1"), F.col("n").alias("n_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n").alias("n_b")), "w2")
        .select("w1", "w2", "n_ab", "n_a", "n_b")
    )


def search_topk(
    documents: DataFrame,
    terms: list[str],
    k: int = 15,
    text_col: str = "text",
) -> DataFrame:
    """Keyword search: score every document against a bag of query terms
    with a TF·IDF-family ranking and return the top-k — the text-side
    complement to the embedding similarity search operators.

    Scoring is integer-exact for engine parity: idf is quantized to
    ``floor(10⁶·N/df)`` per term (N total docs, df the term's document
    frequency — both exact integers, so the quotient double and its floor
    are identical in every IEEE engine) and the document score is
    ``Σ tf·idf_q`` — an integer. Ties break on doc_id.

    Scale shape: per-document term frequencies are a zero-shuffle
    projection (one ``filter``+``size`` per query term — terms are a
    handful, not the vocabulary); the (N, df…) corpus stats are one 1-row
    aggregate that joins back as a broadcast (never a driver collect), so
    scoring is a single pass ending in a TakeOrderedAndProject top-k."""
    toks = tokens_col(F.col(text_col))
    base = documents.select("doc_id", toks.alias("_toks"))

    def _match(term):
        # NB: a single-arg lambda is required — a two-arg lambda would hit
        # F.filter's (element, index) overload and bind the index instead
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(F.col("_toks"), _match(t)))
        .cast("long")
        .alias(f"_tf_{i}")
        for i, t in enumerate(terms)
    ]
    with_tf = base.select("doc_id", *tf_cols)
    stats = with_tf.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = with_tf.crossJoin(F.broadcast(stats))
    score = F.lit(0).cast("long")
    for i in range(len(terms)):
        idf_q = F.floor(
            F.lit(1e6) * F.col("_n") / F.col(f"_df_{i}")
        ).cast("long")
        score = score + F.when(
            F.col(f"_df_{i}") > 0, F.col(f"_tf_{i}") * idf_q
        ).otherwise(F.lit(0))
    return (
        scored.select("doc_id", score.cast("long").alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def inverted_index(
    documents: DataFrame,
    min_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Term → sorted posting list (array of doc ids) + document frequency —
    the search-index build step as a dataflow: whitespace-tokenize, dedupe
    terms within a document (``array_distinct`` BEFORE the explode, so the
    shuffle carries each (term, doc) pair once, not once per occurrence),
    then one groupBy(term) assembling the postings.

    Scale shape: one shuffle keyed by term. Posting lists of stop-word-like
    terms are the skew risk at 100 TB — ``min_df`` prunes the long tail
    cheaply, and a production build would cap or shard hot terms'
    lists (the same cap discipline as dedup's AGG_DEPS_CAP); df itself is
    computed from the same aggregation, no second pass.
    """
    toks = documents.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda x: x != "",
                )
            )
        ).alias("term"),
    )
    return (
        toks.groupBy("term")
        .agg(
            F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
            F.count(F.lit(1)).cast("long").alias("df"),
        )
        .where(F.col("df") >= min_df)
    )


def bpe_merge_round(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One vocabulary-induction (BPE/WordPiece) merge-selection round,
    distributed: count all adjacent token pairs across the corpus, pick
    the most frequent pair (count desc, then lexicographic — fully
    deterministic), and account its corpus-wide effect: total tokens
    before/after applying the merge and how many documents it touches.
    Returns one row: (pair_left, pair_right, pair_count, tokens_before,
    tokens_after, docs_affected).

    Restricted to pairs whose halves differ (x ≠ y): distinct-token
    merges can never overlap themselves, so merge applications == pair
    occurrences exactly — both engines count them identically with no
    greedy left-to-right tie-breaking. (Equal-token runs need
    floor(run/2) greedy semantics; a production tokenizer trainer adds
    the gaps-and-islands run-length pass from sessionize.py for those.)

    Scale shape: pair extraction is a transform+explode in the scan stage
    (zero joins); the count shuffles on the pair key once; everything
    after the top-1 is broadcast 1-row arithmetic. The full BPE trainer
    is this round iterated with the merge applied via an array rewrite —
    the same driver-side iteration discipline graph.py uses."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit("")).alias(
            "l"
        ),
    )
    pairs = (
        toks.where(F.size("l") >= 2)
        .select(
            "_id",
            F.explode(
                F.expr("transform(sequence(1, size(l)-1), i -> "
                       "struct(l[i-1] AS a, l[i] AS b))")
            ).alias("p"),
        )
        .select("_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    top = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "a", "b")
        .limit(1)
        .select(
            F.col("a").alias("pair_left"),
            F.col("b").alias("pair_right"),
            "pair_count",
        )
    )
    totals = toks.agg(
        F.sum(F.size("l")).cast("long").alias("tokens_before")
    )
    affected = (
        pairs.join(
            F.broadcast(top),
            (F.col("a") == F.col("pair_left"))
            & (F.col("b") == F.col("pair_right")),
            "left_semi",
        )
        .agg(F.countDistinct("_id").cast("long").alias("docs_affected"))
    )
    return (
        top.join(F.broadcast(totals))
        .join(F.broadcast(affected))
        .select(
            "pair_left",
            "pair_right",
            "pair_count",
            "tokens_before",
            (F.col("tokens_before") - F.col("pair_count"))
            .cast("long")
            .alias("tokens_after"),
            "docs_affected",
        )
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = "_",
):
    """Iterated BPE trainer: ``n_merges`` rounds of merge-selection
    (:func:`bpe_merge_round` semantics, distinct-token pairs) each
    followed by a corpus rewrite that fuses the chosen pair
    left-to-right non-overlapping. Returns (merges, tokenized):
    ``merges`` is a driver-side list of dicts (round, pair_left,
    pair_right, pair_count) — O(n_merges), the "vocabulary"; ``tokenized``
    is the final token-array DataFrame (doc_id, tokens).

    The rewrite is a pure-Catalyst ``F.aggregate`` fold over each token
    array (accumulator = (output-so-far, pending token)): no Python in
    the loop, no shuffle — the only exchanges are the per-round pair
    counts. Per-round lineage is truncated with localCheckpoint (the
    graph.py iteration discipline) so round k's plan doesn't embed k-1
    folds. Per-doc cost of the fold is O(len²) array copying — fine for
    document tokens (hundreds), the documented bound; a production
    trainer shards giant docs with chunking.py first. Each selection
    collects ONE row to the driver, which is what makes this iterative
    algorithm cluster-shaped."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit("")).alias(
            "tokens"
        ),
    ).localCheckpoint()
    merges: list[dict] = []
    for rnd in range(n_merges):
        pairs = (
            toks.where(F.size("tokens") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(tokens)-1), i -> "
                        "struct(tokens[i-1] AS a, tokens[i] AS b))"
                    )
                ).alias("p")
            )
            .select("p.a", "p.b")
            .where(F.col("a") != F.col("b"))
        )
        top = (
            pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0].a, top[0].b, top[0].c
        merges.append(
            {"round": rnd, "pair_left": a, "pair_right": b, "pair_count": c}
        )
        fused = a + joiner + b
        la, lb, lf = F.lit(a), F.lit(b), F.lit(fused)
        acc0 = F.struct(
            F.expr("CAST(array() AS array<string>)").alias("out"),
            F.lit(None).cast("string").alias("p"),
        )

        def step(acc, x):
            return (
                F.when(
                    acc["p"].isNull(),
                    F.struct(acc["out"].alias("out"), x.alias("p")),
                )
                .when(
                    (acc["p"] == la) & (x == lb),
                    F.struct(
                        F.concat(acc["out"], F.array(lf)).alias("out"),
                        F.lit(None).cast("string").alias("p"),
                    ),
                )
                .otherwise(
                    F.struct(
                        F.concat(acc["out"], F.array(acc["p"])).alias("out"),
                        x.alias("p"),
                    )
                )
            )

        def fin(acc):
            return F.when(acc["p"].isNull(), acc["out"]).otherwise(
                F.concat(acc["out"], F.array(acc["p"]))
            )

        # lazy cut: the next round's top-pair collect (or the caller's
        # action after the last round) materializes the rewrite — one
        # job per round instead of two
        toks = toks.withColumn(
            "tokens", F.aggregate("tokens", acc0, step, fin)
        ).localCheckpoint(eager=False)
    return merges, toks


def lm_fluency(documents: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Bigram language-model fluency score per document — the CCNet-style
    "train an LM on the corpus, score each doc, filter the least fluent"
    quality gate, with integer-exact arithmetic so every engine agrees
    bit-for-bit (no transcendental perplexity: the score is the summed
    add-one-smoothed bigram probability, fixed-point scaled).

    Per doc bigram (a, b): p_scaled = (scale * (c_ab + 1)) div (c_a + V)
    where c_ab / c_a are corpus bigram/unigram counts and V is vocabulary
    size. fluency = Σ p_scaled; avg_fluency = fluency div n_bigrams.
    Higher = more predictable under the corpus LM.

    Scale contract: the model relations are aggregation-sized (vocab and
    bigram-type counts, not corpus-sized) — at 100 TB you'd cap to the
    top-V types and broadcast; here they flow through ordinary shuffle
    joins keyed on the bigram. V is a broadcast 1-row aggregate. The
    corpus is scanned twice (token counts, bigram stream); both scans are
    codegen'd projections with map-side partial aggs.
    """
    toks = documents.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    uni = toks.select(F.explode("toks").alias("w"))
    c_a = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c_a"))
    vocab = uni.agg(F.countDistinct("w").alias("vsz"))
    bg = (
        toks.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c_ab = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    scored = (
        bg.join(c_ab, ["w1", "w2"])
        .join(c_a.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(f"({scale} * (c_ab + 1)) div (c_a + vsz)").alias("p"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("p").cast("long").alias("fluency"),
        F.expr("sum(p) div count(1)").cast("long").alias("avg_fluency"),
    )


def strip_boilerplate(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate removal — the REPAIR half of x35's
    repeated-span detection: cut every non-overlapping ``n``-token chunk
    that appears in more than ``max_df`` distinct documents (headers,
    footers, navigation junk in a crawl), and reassemble each document
    from its surviving chunks in order.

    Chunking is pure Catalyst (``sequence``/``slice``/``inline`` — no
    Python, no per-row UDF); the chunk-frequency relation is corpus-wide
    but only O(distinct chunks) and its frequent slice (the only thing
    joined back) is a broadcast — the corpus itself is never shuffled.
    Reassembly sorts each document's surviving (idx, chunk) pairs inside
    an array aggregate, so ordering never depends on task order.

    Returns (id, n_chunks, n_removed, cleaned); fully-boilerplate
    documents survive with an empty ``cleaned``.
    """
    toks = F.split(F.col(text_col), " ")
    nch = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.struct(
            (i + 1).alias("idx"),
            F.array_join(F.slice(toks, i * n + 1, n), " ").alias("chunk"),
        ),
    )
    base = documents.select(
        F.col(id_col), nch.alias("n_chunks"), chunks.alias("_chunks")
    )
    expl = base.select(id_col, "n_chunks", F.inline("_chunks"))
    frequent = (
        expl.select("chunk", id_col)
        .distinct()
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > max_df)
        .select("chunk")
    )
    kept = expl.join(F.broadcast(frequent), "chunk", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("idx", "chunk"))
                ),
                lambda s: s.getField("chunk"),
            ),
            " ",
        ).alias("cleaned"),
    )
    return (
        base.select(id_col, "n_chunks")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_chunks").cast("long").alias("n_chunks"),
            (
                F.col("n_chunks") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
            F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned"),
        )
    )


def feature_hash_vectors(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = 32,
) -> DataFrame:
    """The hashing trick: fixed-width token-count vectors with NO
    vocabulary pass — token t increments slot md5(t) mod ``dims`` — the
    one-scan featurizer that needs no fitted state, no broadcast vocab,
    and no second job, which is why it is the standard first featurizer
    at corpus scale (collisions are the accepted trade; dims tunes
    them). Pure Catalyst, zero shuffles before the caller's own
    aggregation.

    Plan shape matters here: the histogram is ONE ``aggregate`` fold
    that references the hashed-slot array exactly once (a per-slot
    ``filter`` loop re-evaluates the md5 map ``dims`` times once
    CollapseProject inlines it — measured 9.3 s vs 0.9 s at sf0.1), and
    the derived stats read the vector through a Generate barrier so
    projection collapse cannot inline the fold into each of them.

    Returns (id, vec array<long>, nnz, max_count). The md5-derived slot
    hash is engine-reproducible, so an external SQL engine builds the
    identical vectors (unlike JVM-seeded hashes).
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    hashed = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
        .cast("long")
        % dims,
    )
    vec = F.aggregate(
        hashed,
        F.expr(f"array_repeat(0L, {dims})"),
        lambda acc, s: F.transform(
            acc,
            lambda c, i: F.when(i.cast("long") == s, c + 1).otherwise(c),
        ),
    )
    barrier = documents.select(
        F.col(id_col), F.explode(F.array(vec)).alias("vec")
    )
    return barrier.select(
        id_col,
        "vec",
        F.size(F.filter(F.col("vec"), lambda c: c > 0))
        .cast("long")
        .alias("nnz"),
        F.array_max("vec").cast("long").alias("max_count"),
    )


# x135: BPE merge application. The serving half of the tokenizer story
# (bpe_merge_round above is one TRAINING round): a trained merge list
# ships as constants and tokenizes the corpus. Key identity: with each
# token rendered as SEP+token+SEP (adjacent tokens share NOTHING),
# applying ONE merge (a, b) -> ab is EXACTLY the literal string replace
# of SEP+a+SEP+SEP+b+SEP with SEP+ab+SEP — SQL replace() substitutes
# left-to-right over non-overlapping occurrences, which is precisely
# BPE's single-pass greedy semantics. The naive chars-joined-by-one-SEP
# encoding is WRONG twice over: a pattern can match across a longer
# token's tail ("aa|n" contains "a|n"), and consecutive pairs share the
# boundary separator so the second match is missed ("ab" in "abab") —
# the wrapped encoding fixes both, and the identity is fuzz-verified
# against a reference carry-pass implementation over 20k random words
# in tests. K merges = K chained replaces — pure codegen string ops,
# zero Python, bit-identical in any engine with a literal replace.
BPE_SEP = "\x1f"  # unit separator: cannot appear in tokenized words


# The chained-replace form compiles ONE Catalyst expression per merge;
# past ~this many merges the expression tree stops being the fast path
# (compile time and codegen size grow linearly with the vocabulary, and
# real tokenizer vocabularies are 10k+ merges). "auto" switches to the
# mapInPandas pair-index path beyond it (VERDICT r7 item 5).
BPE_REPLACE_MAX_MERGES = 512


def bpe_apply_tokens(
    documents: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    impl: str = "auto",
) -> DataFrame:
    """(token, n) counts over the corpus after applying ``merges`` (in
    rank order) to every lowercase word. Merge pairs must be
    separator-free, lowercase, and pairwise distinct (validated): they
    are a TRAINED VOCABULARY shipped as constants — the
    offline-train/online-serve split, same as the pinned IVF quantizer.

    Two execution paths with IDENTICAL semantics (one left-to-right
    non-overlapping pass per merge, in rank order — parity- and
    fuzz-tested against a reference carry-pass):

    - ``impl="replace"``: each word becomes its wrapped-token encoding
      (above), then one literal ``replace`` per merge — pure codegen
      string ops, zero Python. The right path for small vocabularies;
      compile cost grows linearly with the merge count.
    - ``impl="scan"``: the large-vocabulary serving path (10k+ merges,
      where a 10k-deep chained expression stops compiling well). ONE
      hash-aggregation first reduces the corpus to DISTINCT words with
      counts (the Python stage then runs per unique word, not per
      occurrence), then an Arrow-batched ``mapInPandas`` applies the
      merges via a pair→rank hash index and a rank min-heap: only the
      merges whose pair is actually adjacent in the word are ever
      touched, so per-word cost is O(len + fired·len), INDEPENDENT of
      the vocabulary size. Index and ranks are bound by closure
      (ships by value — the factory-closure pickling contract,
      jpegcodec._make_jpeg_codec is the template).
    - ``impl="auto"``: "replace" up to ``BPE_REPLACE_MAX_MERGES``
      merges, "scan" beyond.
    """
    if impl not in ("auto", "replace", "scan"):
        raise ValueError(f"impl must be auto|replace|scan, got {impl!r}")
    seen_pairs = set()
    for a, b in merges:
        if not a or not b or BPE_SEP in a + b or (a + b) != (a + b).lower():
            raise ValueError(f"invalid merge pair: {(a, b)!r}")
        if (a, b) in seen_pairs:
            # a trained BPE list cannot contain the same pair twice (each
            # merge mints a new symbol); a duplicate would also break the
            # scan path's first-rank-wins pair index
            raise ValueError(f"duplicate merge pair: {(a, b)!r}")
        seen_pairs.add((a, b))
    if impl == "auto":
        impl = "replace" if len(merges) <= BPE_REPLACE_MAX_MERGES else "scan"
    words = documents.select(
        F.explode(tokens_col(F.col(text_col))).alias("w")
    ).where(F.col("w").rlike("^[a-z]+$"))
    if impl == "scan":
        return _bpe_apply_scan(words, merges)
    # 'the' -> '<S>t<S><S>h<S><S>e<S>' (each char wrapped SEP..SEP)
    chars = F.filter(F.split(F.col("w"), ""), lambda x: x != F.lit(""))
    seg = F.concat_ws(
        "", F.transform(chars, lambda c: F.concat(F.lit(BPE_SEP), c, F.lit(BPE_SEP)))
    )
    for a, b in merges:
        seg = F.replace(
            seg,
            F.lit(BPE_SEP + a + BPE_SEP + BPE_SEP + b + BPE_SEP),
            F.lit(BPE_SEP + a + b + BPE_SEP),
        )
    tokens = F.split(F.btrim(seg, F.lit(BPE_SEP)), BPE_SEP + BPE_SEP)
    return (
        words.select(F.explode(tokens).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _make_bpe_word_segmenter():
    """Factory for the per-word BPE kernel. Defined INSIDE a factory so
    cloudpickle ships it BY VALUE into mapInPandas closures (a plain
    module-level function pickles by reference and raises
    ModuleNotFoundError on executors when the driver runs outside the
    repo — jpegcodec._make_jpeg_codec is the template)."""

    import heapq

    def bpe_segment_word(word, merges, rank=None):
        """Sequential-pass BPE segmentation of ONE word — the scan
        path's kernel. Exactly the chained-replace semantics: for each
        merge in rank order, one left-to-right non-overlapping pass.
        The pair→rank index + min-heap skips merges whose pair never
        occurs, so cost is O(len + fired·len) regardless of vocabulary
        size: pop the smallest APPLICABLE rank (stale ranks ≤ the last
        processed one are duplicates — skip), run its pass, then
        re-index the word's pairs and push ranks still ahead of the
        cursor. Pushing the conservative superset (all current pairs
        with rank > r, not just newly created ones) keeps the
        bookkeeping trivial; a popped rank whose pair has since been
        destroyed fires a no-op pass, same as the sequential scan
        would.

        ``rank`` is the prebuilt pair→rank index ({(a, b): i}); callers
        segmenting MANY words against one vocabulary must build it once
        and pass it in — rebuilding it per word would reintroduce the
        O(|merges|) per-word setup this path exists to avoid (the
        convenience default builds it on the fly for one-off calls)."""
        if rank is None:
            rank = {p: i for i, p in enumerate(merges)}
        toks = list(word)
        heap = sorted({rank[p] for p in zip(toks, toks[1:]) if p in rank})
        last = -1
        while heap:
            r = heapq.heappop(heap)
            if r <= last:
                continue
            last = r
            a, b = merges[r]
            out = []
            i, n, fired = 0, len(toks), False
            while i < n:
                if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                    fired = True
                else:
                    out.append(toks[i])
                    i += 1
            if not fired:
                continue
            toks = out
            for p in zip(toks, toks[1:]):
                rp = rank.get(p)
                if rp is not None and rp > r:
                    heapq.heappush(heap, rp)
        return toks

    return bpe_segment_word


bpe_segment_word = _make_bpe_word_segmenter()


def _bpe_apply_scan(words: DataFrame, merges: "list[tuple[str, str]]") -> DataFrame:
    """Large-vocabulary BPE apply: distinct-word rollup → mapInPandas
    segmentation → token-count aggregation. The Python stage sees each
    DISTINCT word once (Zipf makes that a small fraction of
    occurrences); counts re-weight the emitted tokens."""
    distinct_words = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("wn")
    )

    def _make_segmenter(merges=tuple(merges), seg_word=bpe_segment_word):
        ms = [tuple(p) for p in merges]

        def segment(batches):
            from collections import Counter

            import pandas as pd

            # pair->rank index built ONCE per task, shared by every word
            # (per-word rebuild would cost O(|merges|) setup per word —
            # exactly the vocabulary-size term the scan path eliminates)
            rank = {p: i for i, p in enumerate(ms)}
            for pdf in batches:
                counts: Counter = Counter()
                for w, wn in zip(pdf["w"], pdf["wn"]):
                    for tok in seg_word(w, ms, rank):
                        counts[tok] += int(wn)
                if counts:
                    yield pd.DataFrame(
                        {"token": list(counts), "n": list(counts.values())}
                    )

        return segment

    partial = distinct_words.mapInPandas(
        _make_segmenter(), schema="token string, n long"
    )
    return partial.groupBy("token").agg(F.sum("n").cast("long").alias("n"))


# x138: the feature catalog for the pinned linear quality model, in the
# FIXED fold order both engines must use. Each feature is a ratio of
# exact integer counts (one correctly-rounded IEEE division), so the
# weighted sum is bit-identical across engines as long as the fold
# order and the weight constants match — the same determinism argument
# as text_stats' composite quality_score (x6, oracle-green since r1).
QUALITY_MODEL_FEATURES = (
    "length_norm",     # min(n_words, 100) / 100
    "punct_ratio",     # punct chars / max(n_chars, 1)
    "stopword_ratio",  # stopword hits / max(n_words, 1)
    "digit_ratio",     # digit chars / max(n_chars, 1)
    "caps_ratio",      # uppercase chars / max(n_chars, 1)
)


def quality_model_score(
    documents: DataFrame,
    weights: "dict[str, float]",
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """Linear quality-model SERVING: score every document with a PINNED
    weight vector over the fixed feature catalog above — the fasttext-
    style quality-classifier step of an LLM data pipeline, reduced to
    its engine-exact linear core (weights are trained OFFLINE and ship
    as constants; the pinned-model split, same as ivf/SQ8/PQ/the frozen
    MinHash index). The reported score is the raw LOGIT
    ``bias + Σ w_f · f`` — deliberately NOT a sigmoid: IEEE exp() is
    not correctly rounded and would hang cross-engine exactness on
    libm; the logit is monotone in the probability, so thresholding it
    is the same classifier.

    ``keep = score >= threshold`` is an exact double comparison — both
    engines compute the identical double, so the gate never diverges.

    One projection, zero shuffles — scales with the scan."""
    unknown = set(weights) - set(QUALITY_MODEL_FEATURES)
    if unknown:
        raise ValueError(
            f"quality_model_score: unknown features {sorted(unknown)}; "
            f"catalog is {list(QUALITY_MODEL_FEATURES)}"
        )
    import math as _math

    for name, w in list(weights.items()) + [("bias", bias), ("threshold", threshold)]:
        if not _math.isfinite(float(w)):
            raise ValueError(f"quality_model_score: {name} is non-finite")
    text = F.col(text_col)
    toks = tokens_col(text)
    n_words = F.size(toks).cast("long")
    c = F.greatest(F.length(text).cast("long"), F.lit(1))
    t = F.greatest(n_words, F.lit(1))
    feats = {
        "length_norm": F.least(n_words, F.lit(100)) / F.lit(100.0),
        "punct_ratio": F.length(
            F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
        ).cast("long") / c,
        "stopword_ratio": F.size(
            F.filter(toks, lambda x: x.isin(STOPWORDS))
        ).cast("long") / t,
        "digit_ratio": F.length(
            F.regexp_replace(text, r"[^0-9]", "")
        ).cast("long") / c,
        "caps_ratio": F.length(
            F.regexp_replace(text, r"[^A-Z]", "")
        ).cast("long") / c,
    }
    score = F.lit(float(bias))
    for name in QUALITY_MODEL_FEATURES:  # catalog order = fold order
        if name in weights:
            score = score + F.lit(float(weights[name])) * feats[name]
    return documents.select(
        "doc_id",
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def char_entropy_profile(
    documents: DataFrame,
    gate_bits: float = 4.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon character entropy — the gibberish/spam gate
    the quality family lacked: length/punct/stopword ratios (x6),
    repetition (x18), and LM fluency (x93) all miss low-entropy
    degenerate text (one repeated character, base64 blobs at the OTHER
    extreme) that a character distribution catches directly.

    Engine-exactness: character counts are exact integers from a
    positional substring explode (no regex-split edge cases); the
    entropy sum folds the per-character terms in CHARACTER ORDER
    (sort_array → left-to-right aggregate), so both engines add the
    same IEEE doubles in the same sequence — the x136 list_reduce
    contract. ``keep`` compares the ROUNDED bits against the gate so
    the flag is a pure function of the reported value.

    Scale posture (100 TB): the char explode is the corpus in rows,
    but per-doc histograms complete MAP-SIDE (partial aggregation on
    (doc, char) — documents are never split across partitions), so the
    shuffle carries only histogram rows (≤ alphabet size per doc); the
    fold then runs on one array per document. One data-bearing pass.
    """
    if gate_bits < 0:
        raise ValueError(
            f"char_entropy_profile: gate_bits={gate_bits} must be >= 0"
        )
    norm = documents.select(
        F.col(id_col).alias("doc_id"),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")).alias(
            "t"
        ),
    )
    # empty docs: sequence(1, 0) would DESCEND in Spark — explode only
    # non-empty text and re-attach empties through the final left join
    chars = norm.where(F.length("t") > 0).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t")),
                lambda i: F.substring(F.col("t"), i, 1),
            )
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    hist = counts.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("ch", "c"))).alias("hist"),
        F.sum("c").alias("n_chars"),
        F.count("*").alias("n_distinct_chars"),
    )
    n = F.col("n_chars").cast("double")
    ent_nats = F.aggregate(
        F.transform(
            F.col("hist"),
            lambda s: (s["c"].cast("double") / n)
            * F.log(s["c"].cast("double") / n),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    bits = F.round(-ent_nats / F.log(F.lit(2.0)), 6)
    profiled = hist.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_distinct_chars").cast("long").alias("n_distinct_chars"),
        bits.alias("entropy_bits"),
    )
    # whitespace-only/empty docs carry zero entropy and fail any
    # positive gate — they are exactly the degenerate text the gate is for
    return (
        norm.select("doc_id")
        .join(profiled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias(
                "n_chars"
            ),
            F.coalesce(F.col("n_distinct_chars"), F.lit(0))
            .cast("long")
            .alias("n_distinct_chars"),
            F.coalesce(F.col("entropy_bits"), F.lit(0.0)).alias(
                "entropy_bits"
            ),
            (
                F.coalesce(F.col("entropy_bits"), F.lit(0.0))
                >= F.lit(float(gate_bits))
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def ngram_novelty(
    documents: DataFrame,
    n: int = 3,
    source_col: str = "source",
) -> DataFrame:
    """Marginal n-gram novelty per source — the data-valuation signal
    for mixture design: when sources are admitted in a declared order
    (lexicographic on the source key), how many DISTINCT n-grams does
    each source introduce that no earlier source already covered? A
    source that is large but low-novelty is redundant with what came
    before it (a downweight candidate in x130-style mixing); x31/x34
    measure pairwise/two-corpus overlap but nothing attributes first
    coverage under an ordering.

    Attribution rule: an n-gram is NOVEL for the lexicographically
    smallest source containing it (min(source) per shingle — the
    declared admission order; callers wanting a different order encode
    it in the key). Returns (source, n_occurrences, n_distinct,
    n_novel, novelty_ratio = novel/distinct rounded) ordered by source.

    Scale posture: shingle explode (the x3 cost, shared shape), then
    three partial-aggregated hash shuffles — (source, shingle) distinct,
    min-source per shingle, per-source counts. Nothing pairwise; the
    shuffle keys are md5-narrow shingle strings and the final tables are
    O(sources) rows.
    """
    from samba_spark.operators.dedup import shingles

    pairs = shingles(documents, n, carry_cols=(source_col,))
    occ = pairs.groupBy(source_col).agg(
        F.count("*").alias("n_occurrences")
    )
    distinct_pairs = pairs.select(source_col, "shingle").distinct()
    dist = distinct_pairs.groupBy(source_col).agg(
        F.count("*").alias("n_distinct")
    )
    novel = (
        distinct_pairs.groupBy("shingle")
        .agg(F.min(source_col).alias(source_col))
        .groupBy(source_col)
        .agg(F.count("*").alias("n_novel"))
    )
    return (
        occ.join(dist, source_col)
        .join(novel, source_col, "left")
        .select(
            source_col,
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.coalesce(F.col("n_novel"), F.lit(0))
            .cast("long")
            .alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                / F.col("n_distinct").cast("double"),
                6,
            ).alias("novelty_ratio"),
        )
        .orderBy(source_col)
    )
