"""Text-analysis queries over the documents corpus (north star): token
counting, quality scoring, language-ID heuristic, winnowing fingerprints.
All per-row logic is native Catalyst expressions (functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.dedup import with_tokens
from nyc_analytics_database_platform_spark.operators.prefixsum import (
    ranked_by_range,
)
from nyc_analytics_database_platform_spark.functions.text import (
    BPE_ISH_PATTERN,
    EMAIL_PATTERN,
    LANG_STOPWORDS,
    PHONE_PATTERN,
    SSN_PATTERN,
    bpe_ish_tokens,
    count_in,
    lang_guess,
    lang_guess_oracle_sql,
    punct_ratio,
    redact_pii,
    shingles,
    ws_tokens,
)
from nyc_analytics_database_platform_spark.registry import register

_TOKS_CTE = """
    toks AS (
        SELECT doc_id, text, lang,
               string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    )
"""


@register(
    "text_token_stats",
    oracle=f"""
        WITH {_TOKS_CTE}
        SELECT doc_id,
               length(text) AS n_chars,
               CAST(len(t) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT)
                 AS n_bpe_tokens,
               round(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                     / len(t), 6) AS avg_token_len
        FROM toks
        ORDER BY doc_id
    """,
    tags=("llm", "text"),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + mean token
    length - the cost-estimation pass of a training-data pipeline."""
    docs = load(spark, sf_dir, "documents", parallel=True).withColumn("toks", ws_tokens())
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size("toks").cast("long").alias("n_ws_tokens"),
        F.size(bpe_ish_tokens()).cast("long").alias("n_bpe_tokens"),
        F.round(
            F.aggregate(
                "toks", F.lit(0).cast("long"), lambda a, t: a + F.length(t)
            ).cast("double")
            / F.size("toks"),
            6,
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


_EN = LANG_STOPWORDS["en"]
_EN_SQL = ", ".join(f"'{w}'" for w in _EN)


@register(
    "text_quality_scores",
    oracle=f"""
        WITH {_TOKS_CTE}
        SELECT doc_id,
               round(CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                          / length(text) ELSE 0 END, 6) AS punct_ratio,
               round(CAST(len(list_filter(t, x -> list_contains([{_EN_SQL}], x))) AS DOUBLE)
                     / len(t), 6) AS stopword_ratio,
               CAST(len(t) AS BIGINT) AS n_tokens,
               (len(t) >= 20 AND
                CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                  / length(text) < 0.2) AS passes_quality
        FROM toks
        ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: punctuation ratio, stopword ratio, length gate - the
    heuristic filter stage (C4-style) of a training-data pipeline."""
    docs = load(spark, sf_dir, "documents", parallel=True).withColumn("toks", ws_tokens())
    pr = punct_ratio("text")
    return docs.select(
        "doc_id",
        F.round(pr, 6).alias("punct_ratio"),
        F.round(
            count_in("toks", _EN).cast("double") / F.size("toks"), 6
        ).alias("stopword_ratio"),
        F.size("toks").cast("long").alias("n_tokens"),
        ((F.size("toks") >= 20) & (pr < 0.2)).alias("passes_quality"),
    ).orderBy("doc_id")


@register(
    "text_lang_id",
    oracle=f"""
        WITH {_TOKS_CTE}
        SELECT doc_id, lang AS labeled_lang,
               {lang_guess_oracle_sql("text", "t")} AS guessed_lang
        FROM toks
        ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: CJK char detection + per-language stopword
    scores with fixed-precedence argmax. (The corpus's `lang` labels are
    synthetic and uncorrelated with the text, so the labeled column is
    returned alongside for audit rather than asserted against.)"""
    docs = load(spark, sf_dir, "documents", parallel=True).withColumn("toks", ws_tokens())
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_guess("text", "toks").alias("guessed_lang"),
    ).orderBy("doc_id")


_TFIDF_TERMS = ("spark", "window", "join")


def _tfidf_oracle() -> str:
    tf_cols = ", ".join(
        f"CAST(len(list_filter(t, x -> x = '{w}')) AS BIGINT) AS tf{i}"
        for i, w in enumerate(_TFIDF_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END) AS df{i}"
        for i, w in enumerate(_TFIDF_TERMS)
    )
    score = " + ".join(
        f"tf{i} * ln(CAST(cnt AS DOUBLE) / df{i})" for i in range(len(_TFIDF_TERMS))
    )
    return f"""
        WITH {_TOKS_CTE},
        n AS (SELECT COUNT(*) AS cnt FROM documents),
        df AS (SELECT {df_cols} FROM toks),
        tf AS (SELECT doc_id, {tf_cols} FROM toks)
        SELECT doc_id, tf0, tf1, tf2, round({score}, 6) AS score
        FROM tf, n, df
        ORDER BY doc_id
    """


@register(
    "text_tfidf_scores",
    oracle=_tfidf_oracle(),
    tags=("llm", "text", "tfidf"),
)
def text_tfidf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF relevance of every document to a fixed query-term set: term
    frequencies per doc (one pass) x corpus idf (one tiny aggregate,
    broadcast back). The three-term score is written as an explicit
    fixed-order sum so both engines produce the identical double (then
    rounded to absorb any libm ln() ulp difference).

    Scale: df/N is a one-row broadcast; tf is a narrow per-row expression -
    scoring a 100 TB corpus is a single scan."""
    docs = load(spark, sf_dir, "documents", parallel=True).withColumn("toks", ws_tokens())
    tf = docs.select(
        "doc_id",
        *[
            count_in("toks", [w]).cast("long").alias(f"tf{i}")
            for i, w in enumerate(_TFIDF_TERMS)
        ],
    )
    stats = docs.agg(
        F.count("*").alias("cnt"),
        *[
            F.sum(
                F.when(F.array_contains("toks", w), 1).otherwise(0)
            ).alias(f"df{i}")
            for i, w in enumerate(_TFIDF_TERMS)
        ],
    )
    score = None
    for i in range(len(_TFIDF_TERMS)):
        term = F.col(f"tf{i}") * F.log(F.col("cnt").cast("double") / F.col(f"df{i}"))
        score = term if score is None else score + term
    return (
        tf.crossJoin(F.broadcast(stats))
        .select("doc_id", "tf0", "tf1", "tf2", F.round(score, 6).alias("score"))
        .orderBy("doc_id")
    )


@register(
    "text_winnow_fingerprints",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        sh AS (
            SELECT doc_id, i, md5(array_to_string(t[i:i+2], ' ')) AS h
            FROM toks,
                 unnest(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)
        ),
        wins AS (
            SELECT doc_id,
                   MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM sh
        )
        SELECT doc_id,
               COUNT(DISTINCT fp) AS n_fingerprints,
               MIN(fp) AS min_fp,
               MAX(fp) AS max_fp
        FROM wins
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("llm", "text", "dedup"),
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (rolling min over a window of w=4
    consecutive 3-shingle hashes; Schleimer et al.'s scheme). The distinct
    mins per doc are the fingerprint set; reported as count + extremes.

    Scale: posexplode keeps shingle order; the rolling min is a bounded-frame
    window partitioned by doc - shuffle on doc_id only.
    """
    docs = with_tokens(load(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id", F.posexplode(shingles("toks", 3)).alias("i", "s")
    ).select("doc_id", "i", F.md5("s").alias("h"))
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)
    wins = sh.select("doc_id", F.min("h").over(w).alias("fp"))
    return (
        wins.groupBy("doc_id")
        .agg(
            F.countDistinct("fp").alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


_PII_INJECT_SQL = """
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                 || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                 || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
"""


def _pii_inject_col() -> Column:
    """Deterministic PII injection (the synthetic corpus has none): identical
    expression to _PII_INJECT_SQL so both engines see the same input."""
    d = F.col("doc_id")

    def pad(mod: int, width: int) -> Column:
        return F.lpad((d % mod).cast("string"), width, "0")

    return F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(F.lit(" ssn "), pad(1000, 3), F.lit("-"), pad(100, 2),
                     F.lit("-"), pad(10000, 4)),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0, F.concat(F.lit(" call +1-555-"), pad(10000, 4))
        ).otherwise(F.lit("")),
    )


@register(
    "text_pii_redaction",
    oracle=f"""
        WITH aug AS (
            SELECT doc_id, {_PII_INJECT_SQL} AS t FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '{SSN_PATTERN}')) AS BIGINT) AS n_ssns,
               CAST(len(regexp_extract_all(t, '{PHONE_PATTERN}')) AS BIGINT) AS n_phones,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(t, '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
                       '{SSN_PATTERN}', '<SSN>', 'g'),
                   '{PHONE_PATTERN}', '<PHONE>', 'g') AS redacted
        FROM aug
        ORDER BY doc_id
    """,
    tags=("llm", "text", "pii"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails / SSNs / phone numbers -> typed tags) with
    per-class counts — the redaction pass of a training-data pipeline. The
    corpus is synthetic word soup, so deterministic PII is injected first
    (identically in both engines); the oracle then independently re-derives
    counts and the redacted text, proving the Java-regex and RE2 semantics
    of functions/text.PII_PATTERNS agree.

    Scale: narrow per-row regexp chain, whole-stage codegen, no shuffle."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    aug = docs.select("doc_id", _pii_inject_col().alias("t"))
    return aug.select(
        "doc_id",
        F.regexp_count("t", F.lit(EMAIL_PATTERN)).cast("long").alias("n_emails"),
        F.regexp_count("t", F.lit(SSN_PATTERN)).cast("long").alias("n_ssns"),
        F.regexp_count("t", F.lit(PHONE_PATTERN)).cast("long").alias("n_phones"),
        redact_pii("t").alias("redacted"),
    ).orderBy("doc_id")


@register(
    "text_repetition_scores",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        words AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM words GROUP BY 1, 2),
        ws AS (
            SELECT doc_id, MAX(c) AS top_cnt, CAST(SUM(c) AS BIGINT) AS n_tok,
                   COUNT(*) AS n_distinct
            FROM wc GROUP BY 1
        ),
        bg AS (
            SELECT doc_id, array_to_string(t[i:i+1], ' ') AS b
            FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
        ),
        bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        bs AS (
            SELECT doc_id, MAX(c) AS top_bi, CAST(SUM(c) AS BIGINT) AS n_bi
            FROM bc GROUP BY 1
        )
        SELECT ws.doc_id,
               n_tok AS n_tokens,
               round(1.0 - CAST(n_distinct AS DOUBLE) / n_tok, 6) AS dup_word_frac,
               round(CAST(top_cnt AS DOUBLE) / n_tok, 6) AS top_word_frac,
               round(coalesce(CAST(top_bi AS DOUBLE) / n_bi, 0.0), 6) AS top_bigram_frac,
               (coalesce(CAST(top_bi AS DOUBLE) / n_bi, 0.0) <= 0.2) AS keep
        FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
        ORDER BY ws.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the token-level analogue of Gopher's
    repetition rules, Rae et al. 2021): duplicate-word fraction, most-common-
    word fraction, most-common-bigram fraction, and a keep flag at the 0.20
    top-bigram threshold.

    Scale: two explode -> hash-agg pipelines keyed by doc (shuffle on
    doc-sized keys, never corpus-wide), joined on doc_id. Frequencies are
    per-document, so partial aggregation absorbs the explode fan-out."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    words = docs.select("doc_id", F.explode("toks").alias("tok"))
    ws = (
        words.groupBy("doc_id", "tok").count()
        .groupBy("doc_id")
        .agg(
            F.max("count").alias("top_cnt"),
            F.sum("count").alias("n_tok"),
            F.count("*").alias("n_distinct"),
        )
    )
    bg = docs.select("doc_id", F.explode(shingles("toks", 2)).alias("b"))
    bs = (
        bg.groupBy("doc_id", "b").count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bi"), F.sum("count").alias("n_bi"))
    )
    top_bi_frac = F.coalesce(
        F.col("top_bi").cast("double") / F.col("n_bi"), F.lit(0.0)
    )
    return (
        ws.join(bs, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tok").alias("n_tokens"),
            F.round(
                F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tok"), 6
            ).alias("dup_word_frac"),
            F.round(F.col("top_cnt").cast("double") / F.col("n_tok"), 6).alias(
                "top_word_frac"
            ),
            F.round(top_bi_frac, 6).alias("top_bigram_frac"),
            (top_bi_frac <= 0.2).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "vocab_top_bigrams",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        bg AS (
            SELECT array_to_string(t[i:i+1], ' ') AS bigram
            FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
        )
        SELECT bigram, COUNT(*) AS n
        FROM bg
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 50
    """,
    tags=("llm", "text", "vocab"),
)
def vocab_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide vocabulary induction (the first step of tokenizer/BPE
    training): global top-50 word bigrams. Deterministic tiebreak on the
    bigram string per the top-k discipline.

    Scale: explode -> hash-agg with map-side partial aggregation (the
    corpus-wide count shuffles only distinct bigrams, not occurrences);
    TakeOrderedAndProject bounds the top-k — no global sort."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    bg = docs.select(F.explode(shingles("toks", 2)).alias("bigram"))
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


@register(
    "tokenize_documents_to_ids",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        vocab AS (
            SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS id
            FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
            ORDER BY id LIMIT 20
        ),
        pos AS (
            SELECT doc_id, i, t[i] AS tok
            FROM toks, unnest(generate_series(1, len(t))) AS g(i)
        ),
        mapped AS (
            SELECT p.doc_id, p.i, coalesce(v.id, 0) AS id
            FROM pos p LEFT JOIN vocab v ON p.tok = v.tok
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
               string_agg(CAST(id AS VARCHAR), '|' ORDER BY i) AS ids
        FROM mapped
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("llm", "text", "tokenize"),
)
def tokenize_documents_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer application: encode every document as a sequence of vocab
    ids (top-20 corpus words by frequency, deterministic rank tiebreak;
    out-of-vocabulary -> 0) - the step between vocabulary induction
    (vocab_top_bigrams) and sequence packing (sequence_packing_bins) in a
    training-data pipeline.

    Scale: the vocab is a tiny aggregate broadcast into the exploded token
    stream (per-token narrow join, no shuffle of the corpus); re-assembly
    groups by doc with an order key, so sequences come back deterministic
    regardless of partitioning. `ids` is emitted '|'-joined (string, not
    array<int>) so the driver canonicalizer can hash it."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    words = docs.select(F.explode("toks").alias("tok"))
    w_rank = Window.orderBy(F.col("n").desc(), "tok")
    vocab = (
        words.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .select("tok", F.row_number().over(w_rank).alias("id"))
        # rank filter, NOT limit(): limit on an unordered frame may take an
        # arbitrary 20 rows; the rank predicate is deterministic by content
        .filter(F.col("id") <= 20)
    )
    pos = docs.select("doc_id", F.posexplode("toks").alias("i", "tok"))
    mapped = pos.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", "i", F.coalesce("id", F.lit(0)).alias("id")
    )
    return (
        mapped.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum((F.col("id") == 0).cast("long")).alias("n_oov"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "id"))),
                    lambda s: s["id"].cast("string"),
                ),
                "|",
            ).alias("ids"),
        )
        .orderBy("doc_id")
    )


_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_oracle() -> str:
    tf_cols = ", ".join(
        f"CAST(len(list_filter(t, x -> x = '{w}')) AS BIGINT) AS tf{i}"
        for i, w in enumerate(_TFIDF_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END) AS df{i}"
        for i, w in enumerate(_TFIDF_TERMS)
    )
    score = " + ".join(
        f"ln(1.0 + (CAST(cnt AS DOUBLE) - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * ({_BM25_K1} + 1.0))"
        f" / (tf{i} + {_BM25_K1} * (1.0 - {_BM25_B}"
        f" + {_BM25_B} * dl / avgdl))"
        for i in range(len(_TFIDF_TERMS))
    )
    return f"""
        WITH {_TOKS_CTE},
        lens AS (SELECT doc_id, len(t) AS dl FROM toks),
        n AS (
            SELECT COUNT(*) AS cnt,
                   CAST(SUM(len(t)) AS DOUBLE) / COUNT(*) AS avgdl
            FROM toks
        ),
        df AS (SELECT {df_cols} FROM toks),
        tf AS (SELECT doc_id, {tf_cols} FROM toks)
        SELECT tf.doc_id, dl, round({score}, 6) AS score
        FROM tf
        JOIN lens ON tf.doc_id = lens.doc_id, n, df
        ORDER BY tf.doc_id
    """


@register(
    "text_bm25_scores",
    oracle=_bm25_oracle(),
    tags=("llm", "text", "retrieval"),
)
def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance (k1=1.2, b=0.75) of every document to the fixed query
    terms - TF saturation + document-length normalization on top of the
    TF-IDF shape. Same determinism discipline as text_tfidf_scores: the
    corpus stats (N, avgdl, per-term df) are ONE broadcast row, the
    per-term contributions sum in a fixed order, and round(6) absorbs libm
    ln() ulp differences.

    Scale: scoring is a single scan (narrow per-row expressions x a
    broadcast stats row); ranking consumers put TakeOrderedAndProject on
    top rather than a global sort."""
    docs = load(spark, sf_dir, "documents", parallel=True).withColumn(
        "toks", ws_tokens()
    )
    per_doc = docs.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            count_in("toks", [w]).cast("long").alias(f"tf{i}")
            for i, w in enumerate(_TFIDF_TERMS)
        ],
    )
    stats = docs.agg(
        F.count("*").alias("cnt"),
        (F.sum(F.size("toks")).cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(
                F.when(F.array_contains("toks", w), 1).otherwise(0)
            ).alias(f"df{i}")
            for i, w in enumerate(_TFIDF_TERMS)
        ],
    )
    score = None
    for i in range(len(_TFIDF_TERMS)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("cnt").cast("double") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        term = (
            idf
            * (F.col(f"tf{i}") * F.lit(_BM25_K1 + 1.0))
            / (
                F.col(f"tf{i}")
                + F.lit(_BM25_K1)
                * (
                    F.lit(1.0 - _BM25_B)
                    + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
                )
            )
        )
        score = term if score is None else score + term
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select("doc_id", "dl", F.round(score, 6).alias("score"))
        .orderBy("doc_id")
    )


@register(
    "text_nfc_canonicalize",
    oracle="""
        WITH marked AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % 2 = 0
                                THEN ' cafe' || chr(769)
                                ELSE ' caf' || chr(233) END AS raw
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               nfc_normalize(raw) <> raw AS changed,
               md5(nfc_normalize(raw)) AS norm_digest
        FROM marked
        ORDER BY doc_id
    """,
    tags=("llm", "text", "normalize"),
)
def text_nfc_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization - the pre-dedup text normalization every
    multilingual pipeline runs (composed vs decomposed accents hash
    differently; NFC makes them one string). Spark has no native NFC, so
    this is a SANCTIONED Python path: an Arrow-batched mapInPandas kernel
    over stdlib unicodedata, attested byte-for-byte against DuckDB's
    native nfc_normalize via md5 digests. Each document gets a marker
    suffix (decomposed e+U+0301 on even ids, precomposed U+00E9 on odd),
    so half the corpus genuinely changes under NFC and the changed flag is
    attested in both directions. Scale: narrow per-row kernel, no
    shuffle; the digest is computed on the normalized text so downstream
    exact-dedup keys match across encodings."""
    import hashlib as _hl
    import unicodedata as _ud
    from collections.abc import Iterator as _It

    import pandas as _pd

    docs = load(spark, sf_dir, "documents", parallel=True).filter(
        F.col("text").isNotNull()
    )
    marked = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" cafe\u0301")
            ).otherwise(F.lit(" caf\u00e9")),
        ).alias("raw"),
    )

    schema = "doc_id long, changed boolean, norm_digest string"

    def kernel(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            norm = [_ud.normalize("NFC", s) for s in pdf["raw"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "changed": [n != s for n, s in zip(norm, pdf["raw"])],
                    "norm_digest": [
                        _hl.md5(n.encode("utf-8")).hexdigest() for n in norm
                    ],
                }
            )

    return marked.mapInPandas(kernel, schema).orderBy("doc_id")


@register(
    "vocab_zipf_slope",
    oracle=r"""
        WITH words AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (
                SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
                    AS word
                FROM documents WHERE text IS NOT NULL
            )
            WHERE word <> ''
            GROUP BY word
        ),
        ranked AS (
            SELECT freq,
                   row_number() OVER (ORDER BY freq DESC, word) AS rk
            FROM words
        ),
        pts AS (
            SELECT CAST(ROUND(ln(rk) * 1000000) AS BIGINT) AS x,
                   CAST(ROUND(ln(freq) * 1000000) AS BIGINT) AS y
            FROM ranked
        ),
        mm AS (
            SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                   SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                   SUM(CAST(y AS DECIMAL(38,0))) AS sy,
                   SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                       AS sxx,
                   SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                       AS sxy
            FROM pts
        )
        SELECT CAST(n AS BIGINT) AS n_types,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
        FROM mm
    """,
    tags=("llm", "text", "stats", "monitoring"),
)
def vocab_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the vocabulary: least-squares slope of ln(freq)
    against ln(rank) - natural text sits near -1, and large deviations
    flag templated/boilerplate-heavy corpora (a vocabulary-health
    companion to corpus_ngram_diversity). Log points integerize at 1e-6
    (a final ulp difference in ln() cannot move a 1e-6 rounding except on
    a knife-edge, and the 6dp-rounded slope absorbs even that); moments
    are exact DECIMAL sums multiplied in DECIMAL, so the fit is
    cross-engine exact. Ranks run over the VOCAB frame (sublinear in
    corpus size, Heaps' law) via the SHARDED rank scan
    (operators/prefixsum.ranked_by_range) - range shuffle + parallel
    within-shard window, no single-partition sort even at 100 TB vocab
    sizes."""
    docs = load(spark, sf_dir, "documents", parallel=True).filter(
        F.col("text").isNotNull()
    )
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    ranked, _n = ranked_by_range(
        words, [F.desc("freq"), F.asc("word")], "rk"
    )
    pts = ranked.select(
        F.round(F.log(F.col("rk").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    x, y = F.col("x"), F.col("y")
    mm = pts.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum(x.cast(dec) * x.cast(dec)).alias("sxx"),
        F.sum(x.cast(dec) * y.cast(dec)).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return mm.select(
        F.col("n").cast("long").alias("n_types"),
        F.round(num / den, 6).alias("zipf_slope"),
    )


_TREND_TOP = 15


@register(
    "trending_terms_log_odds",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id % 2 AS epoch, u.tok
            FROM documents,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS u(tok)
            WHERE text IS NOT NULL AND length(trim(text)) > 0
        ),
        tf AS (
            SELECT tok,
                   CAST(SUM(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS a,
                   CAST(SUM(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS b
            FROM toks GROUP BY 1
        ),
        tot AS (
            SELECT SUM(a) AS ta, SUM(b) AS tb,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM tf
        ),
        scored AS (
            SELECT tok, a, b,
                   round(ln((b + 1) / CAST(tot.tb + tot.v AS DOUBLE))
                         - ln((a + 1) / CAST(tot.ta + tot.v AS DOUBLE)), 6)
                       AS log_odds
            FROM tf, tot
        )
        SELECT tok AS term, a AS n_old, b AS n_new, log_odds
        FROM scored
        QUALIFY ROW_NUMBER() OVER (ORDER BY log_odds DESC, tok)
                <= {_TREND_TOP}
        ORDER BY log_odds DESC, term
    """,
    tags=("llm", "text", "drift"),
)
def trending_terms_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-terms screen between two corpus epochs (stand-in split:
    doc parity - in production, crawl snapshots): Laplace-smoothed
    log-odds ln((b+1)/(totB+V)) - ln((a+1)/(totA+V)) per token, top-15
    risers - the vocabulary-drift view that tells a pipeline when its
    tokenizer/filters were tuned on stale text (the corpus-level
    companion to drift_psi_value_buckets and the KS test). Counts stay
    integers; the two lns round at 6dp before the rank cut (term
    tie-break), the repo's pinned-transcendental convention.

    Scale: one (epoch, token) aggregate - map-side combinable - a 1-row
    totals broadcast, and a TakeOrdered top-15; the corpus never
    self-joins."""
    docs = load(spark, sf_dir, "documents", parallel=True).filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    toks = docs.select(
        (F.col("doc_id") % 2).alias("epoch"),
        F.explode(ws_tokens("text")).alias("tok"),
    )
    tf = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("epoch") == 0, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("epoch") == 1, 1).otherwise(0)).cast("long").alias("b"),
    )
    tot = tf.agg(
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.count("*").cast("long").alias("v"),
    )
    scored = tf.crossJoin(F.broadcast(tot)).select(
        F.col("tok").alias("term"),
        F.col("a").alias("n_old"),
        F.col("b").alias("n_new"),
        F.round(
            F.log((F.col("b") + 1) / (F.col("tb") + F.col("v")).cast("double"))
            - F.log((F.col("a") + 1) / (F.col("ta") + F.col("v")).cast("double")),
            6,
        ).alias("log_odds"),
    )
    w = Window.orderBy(F.col("log_odds").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TREND_TOP)
        .drop("rk")
        .orderBy(F.col("log_odds").desc(), "term")
    )


@register(
    "vocab_growth_heaps_curve",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents
            WHERE text IS NOT NULL AND trim(text) <> ''
        ),
        firsts AS (
            SELECT w, MIN(doc_id) AS first_doc FROM toks GROUP BY w
        ),
        bounds AS (SELECT MAX(doc_id) AS mx FROM toks),
        checkpoints AS (
            SELECT k, (SELECT mx FROM bounds) * k // 10 AS cutoff
            FROM unnest(generate_series(1, 10)) AS s(k)
        )
        SELECT c.k AS decile, c.cutoff AS doc_cutoff,
               (SELECT COUNT(*) FROM toks t WHERE t.doc_id <= c.cutoff)
                   AS tokens_seen,
               (SELECT COUNT(*) FROM firsts f WHERE f.first_doc <= c.cutoff)
                   AS vocab_size
        FROM checkpoints c
        ORDER BY decile
    """,
    tags=("llm", "text"),
)
def vocab_growth_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: distinct-vocabulary size and total
    tokens seen at ten corpus checkpoints (docs processed in doc_id order)
    — the measurement behind the SCALE.md claim that |vocab| grows
    sublinearly with corpus size (which is what bounds the BPE training
    loop's per-round cost at 100 TB). Companion to vocab_zipf_slope (the
    frequency-axis law; this is the growth-axis law).

    Cumulative distinct counts without any windowed COUNT DISTINCT: each
    word collapses to its FIRST-occurrence doc (one map-side-combinable
    aggregate - the same first-occurrence idiom as corpus_span_dedup), and
    vocab-at-cutoff is then a plain count over that collapsed frame per
    checkpoint. Checkpoint cutoffs are integer arithmetic (max_doc * k // 10).

    Scale shape: one token explode -> one (word) aggregate; the 10
    checkpoint probes run over the |vocab|-sized collapse, and the token
    counts over a (doc_id) pre-aggregate - never 10 corpus passes."""
    docs = load(spark, sf_dir, "documents", parallel=True).filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("w"),
    )
    firsts = toks.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("n_toks"))
    bounds = toks.agg(F.max("doc_id").alias("mx"))
    checkpoints = (
        spark.range(1, 11)
        .select(F.col("id").cast("int").alias("k"))
        .crossJoin(F.broadcast(bounds))
        .select("k", F.expr("mx * k div 10").alias("cutoff"))
    )
    tokens_seen = (
        checkpoints.join(
            per_doc, per_doc.doc_id <= checkpoints.cutoff, "left"
        )
        .groupBy("k", "cutoff")
        .agg(F.coalesce(F.sum("n_toks"), F.lit(0)).alias("tokens_seen"))
    )
    vocab = (
        checkpoints.join(
            firsts, firsts.first_doc <= checkpoints.cutoff, "left"
        )
        .groupBy("k", "cutoff")
        .agg(F.count("first_doc").alias("vocab_size"))
    )
    return (
        tokens_seen.join(vocab, ["k", "cutoff"])
        .select(
            F.col("k").alias("decile"),
            F.col("cutoff").alias("doc_cutoff"),
            "tokens_seen",
            "vocab_size",
        )
        .orderBy("decile")
    )


@register(
    "lang_id_confusion_matrix",
    oracle=f"""
        WITH {_TOKS_CTE},
        scored AS (
            SELECT lang AS labeled_lang,
                   {lang_guess_oracle_sql("text", "t")} AS guessed_lang
            FROM toks
        )
        SELECT labeled_lang, guessed_lang, COUNT(*) AS n
        FROM scored
        GROUP BY labeled_lang, guessed_lang
        ORDER BY labeled_lang, guessed_lang
    """,
    tags=("llm", "text", "audit"),
)
def lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix between the labeled `lang` column and the
    deterministic lang-ID heuristic (text_lang_id's scorer) — the
    evaluation rollup a classifier audit reads (per-pair counts; row sums
    give label support, the diagonal the agreement). The corpus labels are
    synthetic and uncorrelated with the text, so this documents the
    heuristic's behavior on the driver corpus rather than asserting
    accuracy — the MATRIX mechanics (bounded-domain pair rollup) are what
    the operator contributes.

    Scale shape: the scorer is a narrow per-row expression; the rollup is
    one map-side-combinable aggregate over a |langs|^2-bounded domain."""
    docs = load(spark, sf_dir, "documents", parallel=True).withColumn(
        "toks", ws_tokens()
    )
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            lang_guess("text", "toks").alias("guessed_lang"),
        )
        .groupBy("labeled_lang", "guessed_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("labeled_lang", "guessed_lang")
    )
