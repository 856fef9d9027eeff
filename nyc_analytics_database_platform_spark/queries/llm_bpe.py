"""BPE tokenizer training over the documents corpus: iterative pair-merge
induction (the byte-pair-encoding training loop of Sennrich et al. 2016,
the standard subword-tokenizer construction for LLM pipelines) and the
matching segmentation (apply) pass.

Everything is declarative: the corpus collapses to a (word, freq) table
once, each merge round is one pair-count aggregate + a broadcast of the
1-row argmax pair + a JVM-side `aggregate` lambda fold that rewrites the
per-word symbol arrays - no Python UDFs, no driver-side collect (the
chosen pair travels as a broadcast crossJoin, not a collected literal).

The DuckDB oracle replays the identical algorithm: the same pair counts,
the same (count DESC, left, right) argmax tie-break, and a recursive-CTE
left fold whose merge semantics (left-to-right, non-overlapping - so
pair (a,a) on "aaaa" yields "aa","aa") match the `aggregate` lambda
symbol for symbol. All arithmetic is integer, so parity is bit-exact.

Reference scope: the reference app (webserver/server.py) has no tokenizer;
this family belongs to the LLM-pipeline extension mandated by SURVEY.md
section 2 (training-data ops), alongside vocab_top_bigrams /
tokenize_documents_to_ids in llm_text.py.

Scale (100 TB): the fold runs over the DISTINCT-WORD table, not the
corpus - after the first explode+groupBy (one shuffle, map-side
combinable), every merge round costs a pair aggregate over |vocab| short
arrays plus a 1-row broadcast. |vocab| grows sublinearly with corpus
size (Heaps' law), so 1000 merge rounds at 100 TB iterate over a frame
of maybe 10^7 rows - driver memory never sees it. Round count here is 3
to keep the unrolled oracle readable; the loop is the same at 50k.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register

_STEPS = 3

# Left fold merging adjacent (l, r) symbol pairs left-to-right,
# non-overlapping: seed with the first symbol, then either extend the
# accumulator or fuse its last element with the incoming symbol.
_FOLD = """
    aggregate(
        slice(syms, 2, size(syms) - 1),
        array(syms[0]),
        (acc, x) -> CASE
            WHEN element_at(acc, -1) = _ml AND x = _mr
            THEN concat(slice(acc, 1, size(acc) - 1),
                        array(concat(element_at(acc, -1), x)))
            ELSE concat(acc, array(x))
        END)
"""

_PAIRS = """
    zip_with(slice(syms, 1, size(syms) - 1),
             slice(syms, 2, size(syms) - 1),
             (a, b) -> named_struct('l', a, 'r', b))
"""


def _word_syms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, syms): corpus word frequencies with per-word character
    arrays - the only pass that touches the corpus."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    words = docs.filter(F.col("text").isNotNull()).select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    )
    return (
        words.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn("syms", F.split("word", ""))
    )


def _top_pair(words: DataFrame) -> DataFrame:
    """1-row argmax pair by (count DESC, l, r) - integer-exact, no floats."""
    pairs = (
        words.select("freq", F.explode(F.expr(_PAIRS)).alias("pr"))
        .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )
    return pairs.agg(
        F.min_by(
            F.struct("l", "r", "cnt"),
            F.struct((-F.col("cnt")).alias("nc"), F.col("l"), F.col("r")),
        ).alias("t")
    ).select("t.l", "t.r", "t.cnt")


def _apply_merge(words: DataFrame, top: DataFrame) -> DataFrame:
    """Rewrite every word's symbol array with the chosen pair fused - the
    pair arrives as a broadcast 1-row crossJoin, never a collected value."""
    t = F.broadcast(top.select(F.col("l").alias("_ml"), F.col("r").alias("_mr")))
    return (
        words.crossJoin(t)
        .withColumn("syms", F.expr(_FOLD))
        .drop("_ml", "_mr")
    )


def train_merges(
    spark: SparkSession,
    sf_dir: str,
    steps: int,
    materialize: bool = False,
) -> tuple[DataFrame, list[DataFrame]]:
    """Run `steps` BPE merge rounds; return (final word table, per-step
    pair frames).

    `materialize=False` (the registered 3-round query) chains the rounds
    lazily - fine at small step counts, but round k's argmax then re-derives
    rounds 1..k-1 on every execution, so total work is O(steps^2) vocab
    passes. `materialize=True` is the SCALE PATH for real tokenizer
    training (50-50k merges): each round localCheckpoints the rewritten
    word table AND the 1-row argmax (truncating lineage executor-side; no
    driver round-trip of the data itself), so every round costs exactly one
    pair-count aggregate + one fold over |vocab| rows regardless of how
    many rounds preceded it - the loop cost stays bounded by |vocab|,
    measured in SCALE.md (per-round wall time flat from round 3 to round
    50 at sf0.01). Same algorithm, same results: tests pin that the first
    3 merges of a 12-round materialized run equal the lazy 3-round run."""
    words = _word_syms(spark, sf_dir)
    tops: list[DataFrame] = []
    for _ in range(steps):
        top = _top_pair(words)
        if materialize:
            top = top.localCheckpoint(eager=True)
        tops.append(top)
        words = _apply_merge(words, top)
        if materialize:
            words = words.localCheckpoint(eager=True)
    return words, tops


def _trained(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list[DataFrame]]:
    """The registered 3-round training (lazy chain; see train_merges)."""
    return train_merges(spark, sf_dir, _STEPS)


# --- DuckDB oracle ----------------------------------------------------------

_WORDS_CTE = r"""
    words AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
            FROM documents WHERE text IS NOT NULL
        )
        WHERE word <> ''
        GROUP BY word
    ),
    w0 AS (SELECT word, freq, string_split(word, '') AS syms FROM words)
"""


def _step_ctes(i: int) -> str:
    """Pair counts p{i}, argmax t{i}, recursive fold f{i}, merged words w{i}
    - the exact mirror of (_top_pair, _apply_merge) for round i."""
    return f"""
    p{i} AS (
        SELECT syms[j] AS l, syms[j + 1] AS r, SUM(freq) AS cnt
        FROM w{i - 1}, unnest(generate_series(1, len(syms) - 1)) AS g(j)
        GROUP BY 1, 2
    ),
    t{i} AS (
        SELECT l, r, CAST(cnt AS BIGINT) AS cnt
        FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1
    ),
    f{i} AS (
        SELECT word, freq, syms, 1 AS pos, [syms[1]] AS acc FROM w{i - 1}
        UNION ALL
        SELECT f.word, f.freq, f.syms, f.pos + 1,
            CASE WHEN f.acc[-1] = t.l AND f.syms[f.pos + 1] = t.r
                 THEN f.acc[:len(f.acc) - 1] || [f.acc[-1] || f.syms[f.pos + 1]]
                 ELSE f.acc || [f.syms[f.pos + 1]] END
        FROM f{i} f, t{i} t WHERE f.pos < len(f.syms)
    ),
    w{i} AS (SELECT word, freq, acc AS syms FROM f{i} WHERE pos = len(syms))
"""


_CHAIN = _WORDS_CTE + "," + ",".join(_step_ctes(i + 1) for i in range(_STEPS))


@register(
    "bpe_train_merges",
    oracle=f"""
        WITH RECURSIVE {_CHAIN}
        {" UNION ALL ".join(
            f"SELECT CAST({i + 1} AS INT) AS step, l AS left_sym,"
            f" r AS right_sym, cnt AS pair_count FROM t{i + 1}"
            for i in range(_STEPS)
        )}
        ORDER BY step
    """,
    tags=("llm", "text", "tokenize", "iterative"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE training loop: 3 merge rounds over the corpus word-frequency
    table; each round reports the merged pair and its pre-merge corpus
    count. Per round: one pair-count aggregate (map-side combinable - the
    group count is |observed pairs|, bounded by vocab size squared but in
    practice tiny) + one broadcast argmax row + one narrow fold rewriting
    the symbol arrays. The corpus is read once; every later stage iterates
    over the distinct-word table only."""
    _, tops = _trained(spark, sf_dir)
    steps = [
        t.select(
            F.lit(i + 1).cast("int").alias("step"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            F.col("cnt").alias("pair_count"),
        )
        for i, t in enumerate(tops)
    ]
    # an empty corpus yields a NULL argmax row from the global aggregate;
    # the oracle's LIMIT 1 over an empty frame yields no row - drop NULLs
    # so both engines report an empty merge table
    return (
        reduce(DataFrame.unionByName, steps)
        .filter(F.col("left_sym").isNotNull())
        .orderBy("step")
    )


# --- WordPiece-style greedy segmentation ------------------------------------

# Vocabulary: every corpus character + the top-50 2..4-char substrings by
# frequency-weighted occurrence count (deterministic (count DESC, gram)
# rank). Greedy longest-match-first is the WordPiece/BERT inference rule.
_WP_TOP_GRAMS = 50
_WP_MAX_LEN = 4

_WP_VOCAB_CTES = rf"""
    mg AS (
        SELECT substr(word, i, L) AS gram, CAST(SUM(freq) AS BIGINT) AS n
        FROM words,
             unnest(generate_series(2, {_WP_MAX_LEN})) AS gl(L),
             unnest(generate_series(1, length(word) - L + 1)) AS gi(i)
        GROUP BY 1
    ),
    topg AS (
        SELECT gram FROM (
            SELECT gram, ROW_NUMBER() OVER (ORDER BY n DESC, gram) AS rk
            FROM mg
        ) WHERE rk <= {_WP_TOP_GRAMS}
    ),
    singles AS (
        SELECT DISTINCT unnest(string_split(word, '')) AS gram FROM words
    ),
    vocab AS (SELECT gram FROM topg UNION SELECT gram FROM singles),
    vl AS (SELECT list(gram) AS vs FROM vocab)
"""

# Greedy pick at position `pos` of `word` against vocab list `vs`:
# longest in-vocab piece of length 4..2, else the single character.
def _wp_pick_sql(word: str, pos: str, vs: str) -> str:
    cases = " ".join(
        f"WHEN length({word}) - {pos} + 1 >= {L}"
        f" AND list_contains({vs}, substr({word}, {pos}, {L}))"
        f" THEN substr({word}, {pos}, {L})"
        for L in range(_WP_MAX_LEN, 1, -1)
    )
    return f"CASE {cases} ELSE substr({word}, {pos}, 1) END"


# The Spark-side fold: one pass over character ticks; a tick acts only when
# it equals the cursor, so a consumed k-char piece skips k-1 ticks.
def _wp_fold_expr() -> str:
    picks = " ".join(
        f"WHEN length(word) - acc.p + 1 >= {L}"
        f" AND array_contains(vs, substr(word, acc.p, {L}))"
        f" THEN named_struct('p', acc.p + {L},"
        f" 'ps', concat(acc.ps, array(substr(word, acc.p, {L}))))"
        for L in range(_WP_MAX_LEN, 1, -1)
    )
    return f"""
        aggregate(
            sequence(1, length(word)),
            named_struct('p', 1, 'ps', cast(array() as array<string>)),
            (acc, t) -> CASE
                WHEN t != acc.p THEN acc
                {picks}
                ELSE named_struct('p', acc.p + 1,
                                  'ps', concat(acc.ps, array(substr(word, acc.p, 1))))
            END,
            acc -> acc.ps)
    """


@register(
    "wordpiece_segment_greedy",
    oracle=f"""
        WITH RECURSIVE {_WORDS_CTE},
        {_WP_VOCAB_CTES},
        ranked AS (
            SELECT word, freq,
                   ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rk
            FROM words
        ),
        top20 AS (SELECT word, freq FROM ranked WHERE rk <= 20),
        seg AS (
            SELECT word, freq, 1 AS pos, CAST([] AS VARCHAR[]) AS pieces
            FROM top20
            UNION ALL
            SELECT word, freq, pos + length(pc), pieces || [pc]
            FROM (
                SELECT s.word, s.freq, s.pos, s.pieces,
                       {_wp_pick_sql("s.word", "s.pos", "v.vs")} AS pc
                FROM seg s, vl v
                WHERE s.pos <= length(s.word)
            )
        )
        SELECT word, freq, array_to_string(pieces, '|') AS pieces,
               CAST(len(pieces) AS INT) AS n_pieces
        FROM seg
        WHERE pos = length(word) + 1
        ORDER BY freq DESC, word
    """,
    tags=("llm", "text", "tokenize"),
)
def wordpiece_segment_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style tokenizer INFERENCE: segment the 20 most frequent
    corpus words by greedy longest-match-first against a vocabulary of all
    corpus characters + the top-50 2..4-char substrings (frequency-weighted,
    deterministic (count DESC, gram) rank) - the BERT tokenization rule,
    complementing the merge-order-driven BPE apply pass
    (bpe_segment_top_words). All-integer/string arithmetic, so parity with
    the recursive-CTE oracle is exact; single-char fallback means
    segmentation always completes (every corpus char is in-vocab).

    Scale: the vocab is two bounded aggregates (distinct chars; top-50 of a
    map-side-combinable substring count) broadcast as ONE array row into
    the word table; segmentation is a per-word JVM `aggregate` fold over
    character ticks - a tick acts only when it equals the cursor, so a
    consumed k-char piece skips k-1 ticks and the fold is one linear pass.
    Segmenting the FULL corpus (not just top-20) is the same broadcast fold
    joined back to the token stream, as in tokenize_documents_to_ids."""
    words = _word_syms(spark, sf_dir).select("word", "freq")
    multigrams = words.select(
        "freq",
        # guarded per length: sequence(1, 0) would run DESCENDING in Spark
        # and emit phantom positions for words shorter than L
        F.explode(
            F.expr(
                f"flatten(transform(sequence(2, {_WP_MAX_LEN}), "
                f"L -> CASE WHEN length(word) >= L "
                f"THEN transform(sequence(1, length(word) - L + 1), "
                f"i -> substring(word, i, L)) "
                f"ELSE cast(array() as array<string>) END))"
            )
        ).alias("gram"),
    )
    w_rank = Window.orderBy(F.col("n").desc(), "gram")
    topg = (
        multigrams.groupBy("gram")
        .agg(F.sum("freq").alias("n"))
        .select("gram", F.row_number().over(w_rank).alias("rk"))
        .filter(F.col("rk") <= _WP_TOP_GRAMS)
        .select("gram")
    )
    singles = words.select(F.explode(F.split("word", "")).alias("gram")).distinct()
    vocab_row = (
        topg.unionByName(singles)
        .distinct()
        .agg(F.array_sort(F.collect_list("gram")).alias("vs"))
    )
    w_top = Window.orderBy(F.col("freq").desc(), "word")
    top20 = (
        words.withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") <= 20)
        .select("word", "freq")
    )
    return (
        top20.crossJoin(F.broadcast(vocab_row))
        .withColumn("ps", F.expr(_wp_fold_expr()))
        .select(
            "word",
            "freq",
            F.array_join("ps", "|").alias("pieces"),
            F.size("ps").cast("int").alias("n_pieces"),
        )
        .orderBy(F.col("freq").desc(), "word")
    )


@register(
    "bpe_segment_top_words",
    oracle=f"""
        WITH RECURSIVE {_CHAIN},
        ranked AS (
            SELECT word, freq, syms,
                   row_number() OVER (ORDER BY freq DESC, word) AS rk
            FROM w{_STEPS}
        )
        SELECT word, freq, array_to_string(syms, '|') AS pieces,
               CAST(len(syms) AS INT) AS n_pieces
        FROM ranked WHERE rk <= 10
        ORDER BY freq DESC, word
    """,
    tags=("llm", "text", "tokenize"),
)
def bpe_segment_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer APPLY pass: segment the 10 most frequent corpus words
    with the learned merge table - greedy left-to-right application of the
    3 merges in training order (exactly how a BPE tokenizer encodes at
    inference). Rank filter (row_number <= 10), not limit(), so the cut is
    deterministic by content; segmentation of the full corpus would be the
    same broadcast-fold over the distinct-word table joined back to the
    token stream (tokenize_documents_to_ids shows that join-back shape).
    `pieces` is emitted as a '|'-joined string (not array<string>) so the
    driver's pandas canonicalizer can sort/hash the column."""
    words, _ = _trained(spark, sf_dir)
    w = Window.orderBy(F.col("freq").desc(), "word")
    return (
        words.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            "word",
            "freq",
            F.array_join("syms", "|").alias("pieces"),
            F.size("syms").cast("int").alias("n_pieces"),
        )
        .orderBy(F.col("freq").desc(), "word")
    )


# --- Unigram-LM (SentencePiece-style) Viterbi segmentation ------------------

# Vocabulary: every corpus character + the top-50 2..4-char substrings,
# each with its frequency-weighted occurrence count; piece log-prob
# lp(g) = round(ln(n_g / N), 9) with N = total count over the vocab. The
# 9dp rounding pins the only transcendental to a shared value, so every
# downstream double (path sums, comparisons) is identical cross-engine.
_UNI_TOP_GRAMS = 50
_UNI_MAX_LEN = 4
_UNI_TOP_WORDS = 20


def _uni_cands(word: str, acc: str, t: str, lpm: str) -> str:
    """Spark SQL: candidate list at position `t` - for piece length L,
    extend best[t-L] (= element_at(acc, t-L+1)) with word[t-L+1 .. t]."""
    return f"""
        filter(transform(sequence(1, {_UNI_MAX_LEN}), L ->
            IF({t} >= L
               AND try_element_at({lpm}, substr({word}, {t} - L + 1, L))
                   IS NOT NULL,
               named_struct(
                   's', element_at({acc}, {t} - L + 1).s
                        + try_element_at({lpm}, substr({word}, {t} - L + 1, L)),
                   'p', CASE WHEN element_at({acc}, {t} - L + 1).p = ''
                             THEN substr({word}, {t} - L + 1, L)
                             ELSE concat(element_at({acc}, {t} - L + 1).p,
                                         '|', substr({word}, {t} - L + 1, L))
                        END),
               cast(null as struct<s: double, p: string>))),
            x -> x IS NOT NULL)
    """


def _uni_fold_expr() -> str:
    """DP fold over positions 1..len(word): state = array of best[0..pos]
    structs (score, '|'-joined path). Per-position pick = max score, ties
    to the lexicographically smallest path - the same deterministic rule
    the oracle replays."""
    cands = _uni_cands("word", "acc", "t", "lpm")
    return f"""
        aggregate(
            sequence(1, length(word)),
            array(named_struct('s', cast(0.0 as double), 'p', '')),
            (acc, t) -> concat(acc, array(
                element_at(transform(array({cands}), cs -> named_struct(
                    's', array_max(transform(cs, c -> c.s)),
                    'p', array_min(transform(
                            filter(cs,
                                   c -> c.s = array_max(transform(cs, c -> c.s))),
                            c -> c.p))
                )), 1))),
            acc -> element_at(acc, size(acc)))
    """


def _uni_pick_sql() -> str:
    """DuckDB twin of the per-position pick, over state list s.bests with
    t = s.pos + 1 and the vocab arrays v.vg / v.vlp."""
    piece = "substr(s.word, s.pos + 1 - L + 1, L)"
    cands = f"""
        list_filter(list_transform([1, 2, 3, 4], L ->
            CASE WHEN s.pos + 1 >= L
                      AND list_position(v.vg, {piece}) IS NOT NULL
                 THEN {{'s': s.bests[s.pos + 1 - L + 1].s
                             + v.vlp[list_position(v.vg, {piece})],
                       'p': CASE WHEN s.bests[s.pos + 1 - L + 1].p = ''
                                 THEN {piece}
                                 ELSE s.bests[s.pos + 1 - L + 1].p
                                      || '|' || {piece} END}}
                 ELSE NULL END),
            x -> x IS NOT NULL)
    """
    return f"""
        list_transform([{cands}], cs -> {{
            's': list_max(list_transform(cs, c -> c.s)),
            'p': list_min(list_transform(
                    list_filter(cs,
                        c -> c.s = list_max(list_transform(cs, c -> c.s))),
                    c -> c.p))}})[1]
    """


@register(
    "unigram_viterbi_segment",
    oracle=f"""
        WITH RECURSIVE {_WORDS_CTE},
        g AS (
            SELECT substr(word, i, L) AS gram, CAST(SUM(freq) AS BIGINT) AS n
            FROM words,
                 unnest(generate_series(1, {_UNI_MAX_LEN})) AS gl(L),
                 unnest(generate_series(1, length(word) - L + 1)) AS gi(i)
            GROUP BY 1
        ),
        vocab AS (
            SELECT gram, n FROM g WHERE length(gram) = 1
            UNION ALL
            SELECT gram, n FROM (
                SELECT gram, n,
                       ROW_NUMBER() OVER (ORDER BY n DESC, gram) AS rk
                FROM g WHERE length(gram) >= 2
            ) WHERE rk <= {_UNI_TOP_GRAMS}
        ),
        vl AS (
            SELECT list(gram ORDER BY gram) AS vg,
                   list(round(ln(n / CAST(t.tot AS DOUBLE)), 9)
                        ORDER BY gram) AS vlp
            FROM vocab, (SELECT SUM(n) AS tot FROM vocab) t
            GROUP BY t.tot
        ),
        ranked AS (
            SELECT word, freq,
                   ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rk
            FROM words
        ),
        topw AS (SELECT word, freq FROM ranked WHERE rk <= {_UNI_TOP_WORDS}),
        seg AS (
            SELECT word, freq, 0 AS pos,
                   [{{'s': CAST(0.0 AS DOUBLE), 'p': ''}}] AS bests
            FROM topw
            UNION ALL
            SELECT word, freq, pos + 1, bests || [{_uni_pick_sql()}]
            FROM seg s, vl v
            WHERE s.pos < length(s.word)
        )
        SELECT word, freq,
               bests[length(word) + 1].p AS pieces,
               CAST(length(string_split(bests[length(word) + 1].p, '|'))
                    AS INT) AS n_pieces,
               round(bests[length(word) + 1].s, 6) AS logprob
        FROM seg
        WHERE pos = length(word)
        ORDER BY freq DESC, word
    """,
    tags=("llm", "text", "tokenize"),
)
def unigram_viterbi_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer inference (the SentencePiece decoding rule,
    Kudo 2018): segment the top-{_UNI_TOP_WORDS} corpus words into the
    MAXIMUM-LIKELIHOOD piece sequence under a unigram model - Viterbi DP,
    not greedy - completing the tokenizer trio next to merge-order BPE
    (bpe_segment_top_words) and greedy WordPiece
    (wordpiece_segment_greedy); the three genuinely differ (greedy commits
    to the longest local piece, Viterbi trades it for a globally better
    split). Piece log-probs are frequency-weighted substring counts over
    the vocab (all chars + top-{_UNI_TOP_GRAMS} 2..{_UNI_MAX_LEN}-grams),
    ln pinned to 9dp so both engines fold identical doubles; per-position
    ties resolve (max score, then lexicographically smallest path) - the
    oracle's recursive CTE replays the identical recurrence.

    Scale: vocab = one bounded substring aggregate broadcast as a single
    map row; the DP is a per-word JVM aggregate fold, O(len * maxlen) per
    word over the distinct-word table - full-corpus segmentation is the
    same fold joined back to the token stream."""
    words = _word_syms(spark, sf_dir).select("word", "freq")
    grams = words.select(
        "freq",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, {_UNI_MAX_LEN}), "
                f"L -> CASE WHEN length(word) >= L "
                f"THEN transform(sequence(1, length(word) - L + 1), "
                f"i -> substring(word, i, L)) "
                f"ELSE cast(array() as array<string>) END))"
            )
        ).alias("gram"),
    )
    cnt = grams.groupBy("gram").agg(F.sum("freq").alias("n"))
    w_rank = Window.orderBy(F.col("n").desc(), "gram")
    vocab = cnt.filter(F.length("gram") == 1).unionByName(
        cnt.filter(F.length("gram") >= 2)
        .select("gram", "n", F.row_number().over(w_rank).alias("rk"))
        .filter(F.col("rk") <= _UNI_TOP_GRAMS)
        .drop("rk")
    )
    vrow = (
        vocab.agg(F.array_sort(F.collect_list(F.struct("gram", "n"))).alias("vn"))
        .select(
            F.expr(
                "map_from_arrays(transform(vn, x -> x.gram), "
                "transform(vn, x -> round(ln(x.n / cast("
                "aggregate(vn, 0L, (a, y) -> a + y.n) as double)), 9)))"
            ).alias("lpm")
        )
    )
    w_top = Window.orderBy(F.col("freq").desc(), "word")
    topw = (
        words.withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") <= _UNI_TOP_WORDS)
        .select("word", "freq")
    )
    return (
        topw.crossJoin(F.broadcast(vrow))
        .withColumn("best", F.expr(_uni_fold_expr()))
        .select(
            "word",
            "freq",
            F.col("best.p").alias("pieces"),
            F.size(F.split("best.p", r"\|")).cast("int").alias("n_pieces"),
            F.round("best.s", 6).alias("logprob"),
        )
        .orderBy(F.col("freq").desc(), "word")
    )
