"""Text analysis operator family (beyond-parity: LLM training-data pipeline).

Per-document text statistics over the ``documents`` table, all pure JVM-side
expression compositions (zero Python UDFs), all DuckDB-oracle-expressible:

- **token counting** — whitespace tokens plus a BPE-ish regex token count
  (``regexp_extract_all`` over a word/non-word alternation).
- **quality scoring** — length, distinct-token ratio, stopword ratio, mean
  token length, punctuation ratio: the standard cheap heuristics a corpus
  filter runs before anything model-based.
- **language ID** — corpus-trained n-gram (word unigram) profiles: top-N
  most frequent tokens per labeled language, then classify each document to
  the profile with the largest token overlap. Fully relational (groupBy +
  window top-N + join + argmax), so it trains AND predicts inside the
  engine with no side model artifact.
- **document fingerprinting** — polynomial rolling hash (per-token char
  fold, then a token fold), a locality-insensitive 64-bit-ish content id
  computed with integer arithmetic only — portable bit-for-bit across
  engines, unlike builtin ``hash()``/``xxhash64`` which differ per engine.

Reference parity note: the reference has no text operators at all (its
documents are asteroids); this module is the SURVEY.md §7.7 "beyond-parity"
extension exercised by /root/testdata/sf*/documents.parquet.

Scale design (100 TB):
- token/quality/fingerprint ops are per-row projections — no shuffle, no
  driver involvement, linear in executors.
- language-ID shuffles only (lang, token) count pairs (map-side partial
  agg) to build profiles; profiles are tiny (n_langs x top_n rows) and
  broadcast into the scoring join, so the big side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne-ish primes small enough that every intermediate fits in int64:
# acc < MOD (~2^30), so acc*131 + tok_hash < 2^38 and acc*31 + 127 < 2^35.
_MOD = 1_000_000_007
_TOKEN_BASE = 31
_DOC_BASE = 131

_STOPWORDS = ("a", "the")
_BPE_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


def whitespace_tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def token_count(text_col: str) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(text_col))


def bpe_ish_token_count(text_col: str) -> Column:
    """BPE-ish token estimate: letter runs, single digits, single symbols —
    the shape (not the merges) of a GPT-style pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_RE), 0))


def rolling_hash(text_col: str) -> Column:
    """Polynomial rolling hash of the token sequence, mod 1e9+7.

    tok_hash(t) = fold over chars: acc*31 + ascii(c)  (mod M)
    doc_hash    = fold over tokens: acc*131 + tok_hash (mod M)

    Both folds are explicit left-to-right ``aggregate`` calls so the result
    is identical in any engine that evaluates the same arithmetic — the
    whole point of a *portable* fingerprint. Order-sensitive by design
    (unlike SimHash/MinHash): any edit anywhere changes it.
    """
    tok_hash = (
        "aggregate(transform(sequence(1, length(t)), i -> ascii(substring(t, i, 1))), "
        f"0L, (acc, c) -> (acc * {_TOKEN_BASE} + c) % {_MOD})"
    )
    return F.expr(
        f"aggregate(split({text_col}, ' '), 0L, "
        f"(acc, t) -> (acc * {_DOC_BASE} + {tok_hash}) % {_MOD})"
    )


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Cheap corpus-filter heuristics, one row per document.

    All ratios are a single double division over engine-identical integer
    operands (hash-stable). ``quality_score`` is the product of the two
    "good text" signals a word-soup corpus can express: lexical diversity
    and non-stopword density.
    """
    toks = whitespace_tokens(text_col)
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    stop_arr = ", ".join(f"'{s}'" for s in _STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split({text_col}, ' '), t -> t IN ({stop_arr})))"
    ).cast("bigint")
    total_tok_chars = F.expr(
        f"aggregate(split({text_col}, ' '), 0L, (acc, t) -> acc + length(t))"
    )
    n_punct = F.length(
        F.regexp_replace(F.col(text_col), "[a-z0-9 ]", "")
    ).cast("bigint")
    distinct_ratio = n_distinct.cast("double") / n_tokens
    stopword_ratio = n_stop.cast("double") / n_tokens
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        bpe_ish_token_count(text_col).cast("bigint").alias("n_bpe_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        (total_tok_chars.cast("double") / n_tokens).alias("mean_token_len"),
        (n_punct.cast("double") / F.length(text_col)).alias("punct_ratio"),
        (distinct_ratio * (F.lit(1.0) - stopword_ratio)).alias("quality_score"),
    )


def language_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """Top-N most frequent tokens per labeled language: (lang, token).

    Tie-break is (count DESC, token ASC) so the profile set is deterministic
    across engines and partitionings.
    """
    tok = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(whitespace_tokens(text_col)).alias("token"),
    )
    counts = tok.groupBy("lang", "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select("lang", "token")
    )


def classify_language(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Predict each document's language as the profile with the largest
    token-occurrence overlap; ties break to the lexicographically smallest
    language, no-overlap docs get 'und'.

    The profile table is tiny (n_langs x top_n) — broadcast — so the
    scoring join never shuffles the corpus; the per-doc argmax groups by
    doc_id over n_langs short rows.
    """
    tok = docs.select(
        F.col(id_col), F.explode(whitespace_tokens(text_col)).alias("token")
    )
    scores = (
        tok.join(F.broadcast(profiles), "token")
        .groupBy(id_col, "lang")
        .agg(F.count("*").alias("overlap"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("overlap").desc(), F.col("lang").asc()
    )
    best = (
        scores.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(F.col(id_col), F.col("lang").alias("pred_lang"), "overlap")
    )
    return (
        docs.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("overlap"), F.lit(0)).cast("bigint").alias("overlap"),
        )
    )


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition filters: per-doc top-unigram share and
    duplicate-bigram fraction, plus the keep/drop verdict.

    Degenerate documents (one token looped, boilerplate runs) score high on
    either signal; real corpus filters drop them before dedup so the LSH
    stages never see pathological shingle sets.

    Shape: the bigram fraction is row-local array arithmetic (no shuffle);
    the top-unigram count needs a (doc, token) frequency — explode +
    partial-agg + per-doc max, both exchanges keyed on doc_id-led keys so
    skew follows document size, which the explode already bounded.
    """
    toks = whitespace_tokens(text_col)
    n_tokens = F.size(toks).cast("bigint")
    # bind the token array ONCE via the transform(array(...)) wrapper —
    # naively referencing split() inside the per-element lambda re-executes
    # the split per element after CollapseProject (measured 20x on the
    # simhash fold, see dedup.py)
    # size < 2 guard: sequence(1, 0) DESCENDS in Spark ([1, 0]), so an
    # unguarded 1-token doc would index element_at(ts, 2) out of bounds
    # under ANSI — zero bigrams must be an empty array, not a crash
    bigrams = F.expr(
        f"element_at(transform(array(split({text_col}, ' ')), ts -> "
        "CASE WHEN size(ts) < 2 THEN array() "
        "ELSE transform(sequence(1, size(ts) - 1), "
        "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1))) "
        "END), 1)"
    )
    n_bi = F.size(bigrams).cast("bigint")
    # try_divide: a 1-token doc has zero bigrams — its fraction is NULL
    # (no evidence), exactly what DuckDB's NULL-on-zero-division oracle
    # computes; a raw division would ANSI-throw on the whole job
    dup_bi = F.try_divide(
        (n_bi - F.size(F.array_distinct(bigrams)).cast("bigint")).cast(
            "double"
        ),
        n_bi,
    )

    tok = docs.select(F.col(id_col), F.explode(toks).alias("_t"))
    top = (
        tok.groupBy(id_col, "_t")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top_cnt"))
    )
    base = docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        dup_bi.alias("dup_bigram_frac"),
    )
    return base.join(top, id_col).select(
        id_col,
        "n_tokens",
        (F.col("_top_cnt").cast("double") / F.col("n_tokens")).alias(
            "top_token_share"
        ),
        "dup_bigram_frac",
        (
            (F.col("_top_cnt").cast("double") / F.col("n_tokens") <= 0.2)
            & (F.col("dup_bigram_frac") <= 0.2)
        ).alias("keep"),
    )


def redact_terms(
    docs: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    replacement: str = "<REDACTED>",
) -> DataFrame:
    """Denylist scrubbing: replace whole-word denylist terms, count hits.

    The standard pre-training scrub pass (PII/brand/boilerplate denylists)
    as a pure projection: one regexp_replace + one regexp_count per row,
    word-boundary anchored so substrings survive. Terms are baked into the
    plan as a literal alternation — fine for denylists up to thousands of
    entries; beyond that switch to a broadcast-join token rewrite.
    """
    pat = r"\b(" + "|".join(terms) + r")\b"
    return docs.select(
        F.col(id_col),
        F.regexp_replace(F.col(text_col), pat, replacement).alias("redacted"),
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(
            "n_redactions"
        ),
    )


def fingerprint_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fingerprint): rolling-hash content id + exact digest, the pair a
    dedup pipeline keys on (rolling for ordered content, md5 for bytes)."""
    return docs.select(
        F.col(id_col),
        rolling_hash(text_col).alias("fingerprint"),
        F.md5(F.col(text_col)).alias("digest"),
    )


# ---------------------------------------------------------------------------
# Relevance scoring: TF-IDF top terms, BM25 retrieval
# ---------------------------------------------------------------------------
#
# Both use a RATIONAL idf — tf-idf: (N + 1) / (df + 1); BM25:
# (N + 1) / (df + 0.5) — instead of the textbook ln(...) of the same
# ratio. ln is a transcendental whose last-ulp rounding differs between
# libm implementations (JVM StrictMath vs DuckDB's C runtime), which would
# break the driver's exact value-hash gate; the rational form is a fixed
# tree of IEEE-exact int->double casts, one division and one multiply, so
# Spark and DuckDB produce bit-identical doubles. Because x -> ln(x) is
# monotone, per-term rankings are unchanged; only multi-term BM25 sums can
# order differently from the ln variant (documented, deterministic).


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf.

    Shape: one explode + (doc, term) count (shuffle keyed on the pair, so
    skew follows document length), one (term -> df) aggregate whose output
    is vocabulary-sized and joins back by term (AQE broadcasts it while
    small), corpus size N as a broadcast one-row cross join, then a
    per-doc top-k window. Ties break on term text: deterministic output.
    """
    tok = docs.select(F.col(id_col), F.explode(whitespace_tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * (
                (F.col("n_docs").cast("double") + F.lit(1.0))
                / (F.col("df").cast("double") + F.lit(1.0))
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance of every matching document for a bag of query terms.

    Scale shape — the corpus NEVER shuffles: per-term tf is row-local
    (``size(filter(toks, x -> x = term))``), corpus stats (N, total dl)
    and per-term document frequencies are two one-row aggregates broadcast
    back via cross join, and the score is a pure projection. The only
    exchanges are the two scalar aggregations. Docs matching no term are
    dropped (their score is identically 0).

    Determinism: the score is a FIXED left-to-right sum over ``terms`` of
    per-term rational expressions (query terms are plan literals), so both
    engines evaluate the identical IEEE expression tree — no
    groupBy-over-doubles whose partial-sum order could differ.
    """
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    toks = whitespace_tokens(text_col)

    def tf_of(term: str) -> Column:
        # one-arg lambda only: a 2-arg lambda would be read by PySpark as
        # the (element, index) form and shadow the bound term
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("long")

    base = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        *[tf_of(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.select(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count_if(F.col(f"_tf_{i}") > 0).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    hit = base.filter(
        F.greatest(*[F.col(f"_tf_{i}") for i in range(len(terms))]) > 0
        if len(terms) > 1
        else F.col("_tf_0") > 0
    )
    j = hit.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = (F.col("n_docs").cast("double") + F.lit(1.0)) / (
            F.col(f"_df_{i}").cast("double") + F.lit(0.5)
        )
        tf = F.col(f"_tf_{i}").cast("double")
        score = score + idf * (tf * F.lit(k1 + 1.0)) / (tf + norm)
    return j.select(F.col(id_col), score.alias("bm25"))


def token_rarity_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM quality proxy in COUNT space (the CCNet idea, log-free).

    A document built from rare corpus tokens scores low; boilerplate
    built from the head of the distribution scores high. The canonical
    form averages ``-ln p(tok)``; this keeps the same ordering using the
    mean corpus FREQUENCY of the document's tokens instead — a monotone
    twin (like the tf-idf idf form, textstats.tfidf_top_terms) chosen
    because ``ln`` is not guaranteed bit-identical across engine libms
    while integer count sums are exact.

    Output: ``(doc_id, n_tokens, sum_cf, mean_cf)`` with ``sum_cf`` the
    exact BIGINT sum of per-token corpus counts and ``mean_cf`` one
    double division of exact operands.

    Shape: explode -> (term -> corpus count) aggregate (vocabulary-sized,
    AQE broadcasts the join back) -> per-doc sum. Shuffles carry tokens
    and doc ids, never document bodies.
    """
    tok = docs.select(
        F.col(id_col), F.explode(whitespace_tokens(text_col)).alias("term")
    )
    cf = tok.groupBy("term").agg(F.count("*").cast("bigint").alias("cf"))
    return (
        tok.join(cf, "term")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("cf").cast("bigint").alias("sum_cf"),
        )
        .withColumn(
            "mean_cf",
            F.col("sum_cf").cast("double") / F.col("n_tokens").cast("double"),
        )
    )
