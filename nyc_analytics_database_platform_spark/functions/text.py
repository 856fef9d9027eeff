"""Text-analysis column expressions - all native Catalyst (JVM-side,
whole-stage codegen), no Python UDFs. These are the building blocks of the
LLM-data-pipeline operators: tokenization, shingling, hashing, quality
signals, language heuristics.

Design for 100 TB: every helper is a per-row expression (narrow, no shuffle);
the operators that use them (dedup, fingerprint) decide the distribution
strategy. The only "hash" primitive used cross-engine is md5 (identical hex
output in Spark and DuckDB), so oracles stay exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- tokenization -----------------------------------------------------------


def ws_tokens(col: str = "text") -> Column:
    """Whitespace tokenization of lowercased, trimmed text."""
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def bpe_ish_tokens(col: str = "text") -> Column:
    """BPE-ish regex tokenization: letter runs, digit runs, single symbols -
    the standard pre-tokenizer shape used to estimate LLM token counts."""
    return F.regexp_extract_all(F.col(col), F.lit(BPE_ISH_PATTERN), 0)


def shingles(tokens_col: str, k: int = 5) -> Column:
    """k-word shingles from a tokens array column (guarded: <k tokens ->
    empty array; sequence() would otherwise run descending)."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {k} "
        f"THEN transform(sequence(1, size({tokens_col}) - {k} + 1), "
        f"i -> array_join(slice({tokens_col}, i, {k}), ' ')) "
        f"ELSE array() END"
    )


# --- quality signals --------------------------------------------------------


def punct_ratio(col: str = "text") -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    n = F.length(F.col(col))
    punct = F.length(F.regexp_replace(F.col(col), "[a-zA-Z0-9\\s]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def count_in(tokens_col: str, words: list[str]) -> Column:
    """size(filter(tokens, t -> t IN (...))) as a pure SQL expression."""
    arr = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return F.expr(
        f"size(filter({tokens_col}, t -> array_contains(array({arr}), t)))"
    )


# --- language-ID heuristic ---------------------------------------------------

# Minimal function-word lists per language (public knowledge).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "du", "une", "que"],
    "de": ["der", "die", "und", "den", "von", "das", "mit", "dem", "des", "ein"],
}

# Literal CJK range characters (DuckDB's RE2 rejects \u escapes; both engines
# accept the raw characters).
CJK_PATTERN = "[一-鿿]"


def lang_guess(col: str = "text", tokens_col: str = "toks") -> Column:
    """Deterministic language heuristic: CJK characters -> 'zh'; otherwise the
    argmax of per-language stopword occurrence counts with fixed precedence
    en > es > fr > de; all-zero -> 'und' (undetermined)."""
    scores = {lang: count_in(tokens_col, words) for lang, words in LANG_STOPWORDS.items()}
    has_cjk = F.regexp_count(F.col(col), F.lit(CJK_PATTERN)) > 0
    en, es, fr, de = scores["en"], scores["es"], scores["fr"], scores["de"]
    best = F.greatest(en, es, fr, de)
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(best <= 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("de"))
    )


def lang_guess_oracle_sql(text: str = "text", toks: str = "toks") -> str:
    """The identical heuristic as DuckDB SQL (for the oracle)."""

    def cnt(words: list[str]) -> str:
        arr = ", ".join(f"'{w}'" for w in words)
        return f"len(list_filter({toks}, t -> list_contains([{arr}], t)))"

    en, es, fr, de = (cnt(LANG_STOPWORDS[l]) for l in ("en", "es", "fr", "de"))
    return f"""
        CASE
          WHEN regexp_matches({text}, '{CJK_PATTERN}') THEN 'zh'
          WHEN greatest({en}, {es}, {fr}, {de}) <= 0 THEN 'und'
          WHEN {en} = greatest({en}, {es}, {fr}, {de}) THEN 'en'
          WHEN {es} = greatest({en}, {es}, {fr}, {de}) THEN 'es'
          WHEN {fr} = greatest({en}, {es}, {fr}, {de}) THEN 'fr'
          ELSE 'de'
        END
    """


# --- PII redaction -----------------------------------------------------------

# Patterns restricted to the syntax Java regex (Spark) and RE2 (DuckDB) agree
# on: character classes, bounded repeats, \b word boundaries. No lookarounds,
# no \u escapes (RE2 rejects them).
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
SSN_PATTERN = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
PHONE_PATTERN = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

# Redaction order matters only if patterns overlap; these are disjoint
# (email needs '@', phone needs a leading '+', SSN is bare 3-2-4 digits).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("ssn", SSN_PATTERN, "<SSN>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
]


def redact_pii(col: str | Column) -> Column:
    """Replace every email / SSN / phone occurrence with a typed tag.
    Pure regexp_replace chain: JVM-side, codegen, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c
