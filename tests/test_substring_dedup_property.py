"""Differential property test for corpus_substring_dedup: random corpora
from a SMALL vocabulary (so >= 8-token repeats arise naturally, not only
when planted) plus explicitly planted any-length repeats, run through BOTH
the Spark operator and its registered DuckDB oracle on the same parquet.
The fixed-testdata oracle pins one corpus; this pins the construction
itself across corpus shapes (short docs, heavy self-overlap, repeated
prefixes/suffixes, whole-doc duplicates)."""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import pytest

from nyc_analytics_database_platform_spark.registry import all_specs

_SEED = 20260815
_N_CASES = 8


def _gen_corpus(rng: random.Random) -> list[tuple[int, str, str]]:
    vocab = [f"w{i}" for i in range(rng.randint(6, 24))]
    n_docs = rng.randint(5, 30)
    docs = []
    for d in range(n_docs):
        n = rng.randint(1, 60)
        docs.append([rng.choice(vocab) for _ in range(n)])
    # plant an any-length repeat into ~1/3 of the docs: a slice of an
    # earlier doc (length 8..25) spliced at a random offset
    for d in range(1, n_docs):
        if rng.random() < 0.33:
            src = docs[rng.randrange(d)]
            if len(src) >= 8:
                ln = rng.randint(8, min(25, len(src)))
                st = rng.randrange(len(src) - ln + 1)
                at = rng.randrange(len(docs[d]) + 1)
                docs[d] = docs[d][:at] + src[st : st + ln] + docs[d][at:]
    # and one exact whole-doc duplicate
    if n_docs >= 2 and len(docs[0]) >= 1:
        docs[-1] = list(docs[0])
    return [(i, "fuzz", " ".join(t)) for i, t in enumerate(docs)]


@pytest.mark.parametrize("case_id", range(_N_CASES))
def test_substring_dedup_random_corpus(spark, tmp_path, case_id):
    rng = random.Random(_SEED + case_id * 7919)
    rows = _gen_corpus(rng)
    sf = str(tmp_path / f"sf{case_id}")
    (tmp_path / f"sf{case_id}").mkdir()
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(f"{sf}/documents.parquet")

    spec = all_specs()["corpus_substring_dedup"]
    sdf = spec.fn(spark, sf)
    cols = sorted(sdf.columns)
    got = Counter(tuple(r[c] for c in cols) for r in sdf.collect())

    con = duckdb.connect()
    # Spark writes the table as a DIRECTORY of part files; glob it
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(row[i] for i in idx) for row in cur.fetchall())
    con.close()
    assert sorted(ocols) == cols and got == want, (case_id, len(rows))
