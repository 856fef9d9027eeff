"""End-to-end corpus curation pipeline (plans/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.plans.curation import curate_corpus


def test_curation_on_real_corpus(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", parallel=True)
    curated, rep = curate_corpus(docs)
    # monotone shrinking funnel
    assert (rep.n_input >= rep.n_after_quality >= rep.n_after_exact_dedup
            >= rep.n_after_repetition >= rep.n_after_near_dedup)
    assert rep.n_after_near_dedup == curated.count() > 0
    assert rep.total_tokens > 0
    # near-dedup actually removed the planted near-duplicates
    assert rep.n_after_near_dedup < rep.n_after_exact_dedup
    assert curated.columns == docs.columns


def test_curation_drops_known_duplicates(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep green forest to hide from every single hunter nearby"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact duplicate -> dropped (keep id 1)
            (3, base + " tonight"),  # near duplicate -> dropped by LSH+CC
            (4, "completely different words over here " * 5),  # 25 tokens,
            # but 5x the same phrase: top bigram 5/24 > 0.2 -> repetition gate
            (5, "short text"),  # fails the quality gate (<20 tokens)
            (6, "many unique tokens compose this entirely ordinary sentence "
                "which keeps going with fresh vocabulary until twenty five "
                "distinct words have accumulated for the length gate"),
        ],
        "doc_id long, text string",
    )
    curated, rep = curate_corpus(docs)
    kept = {r["doc_id"] for r in curated.collect()}
    assert kept == {1, 6}
    assert rep.n_input == 6
    assert rep.n_after_quality == 5
    assert rep.n_after_exact_dedup == 4
    assert rep.n_after_repetition == 3  # doc 4 tripped the bigram gate
    assert rep.n_after_near_dedup == 2
