"""Differential query fuzzing: random filter/group-by/aggregate ASTs are
rendered BOTH as a Spark DataFrame plan and as DuckDB SQL and the results
compared bit-for-bit — the randomized extension of the fixed per-query
oracles (SURVEY.md §5), covering operator COMBINATIONS no hand-written
query pins down.

Determinism rules baked into the generator (the repo's cross-engine
conventions — the fuzzer explores plan space, not known-divergence space):
- double SUM/AVG only through integer cents (`CAST(ROUND(x*100) AS
  BIGINT)`); raw-double MIN/MAX is safe (no accumulation);
- every aggregate aliased identically on both sides;
- result comparison sorts by all columns and canonicalizes floats by repr.

Seeded RNG: the same 40 cases every run (a failing case number is
reproducible by seed); bump _SEED deliberately to explore new space.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import random
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import TABLES, load, table_path

_SEED = 20260815
_N_CASES = 40

# (column, kind) of the orders table the generator may touch.
_ORDERS_COLS = {
    "o_orderkey": "int",
    "o_custkey": "int",
    "o_orderstatus": "str",
    "o_totalprice": "money",
    "o_orderdate": "ts",
    "o_orderpriority": "str",
}
_GROUPABLE = ["o_orderstatus", "o_orderpriority", "o_custkey"]


def _domain(con):
    """Pull small value domains from the data so predicates actually select."""
    dom = {}
    dom["o_orderstatus"] = [
        r[0] for r in con.execute(
            "SELECT DISTINCT o_orderstatus FROM orders ORDER BY 1"
        ).fetchall()
    ]
    dom["o_orderpriority"] = [
        r[0] for r in con.execute(
            "SELECT DISTINCT o_orderpriority FROM orders ORDER BY 1"
        ).fetchall()
    ]
    lo, hi = con.execute(
        "SELECT MIN(o_orderkey), MAX(o_orderkey) FROM orders"
    ).fetchone()
    dom["o_orderkey"] = (lo, hi)
    lo, hi = con.execute(
        "SELECT MIN(o_custkey), MAX(o_custkey) FROM orders"
    ).fetchone()
    dom["o_custkey"] = (lo, hi)
    lo, hi = con.execute(
        "SELECT MIN(o_totalprice), MAX(o_totalprice) FROM orders"
    ).fetchone()
    dom["o_totalprice"] = (lo, hi)
    d0, d1 = con.execute(
        "SELECT MIN(CAST(o_orderdate AS DATE)), MAX(CAST(o_orderdate AS DATE))"
        " FROM orders"
    ).fetchone()
    dom["o_orderdate"] = (d0, d1)
    return dom


def _gen_predicate(rng: random.Random, dom) -> tuple[object, str]:
    """One random predicate as (spark Column, sql text)."""
    kind = rng.choice(["status_eq", "prio_in", "key_range", "price_cmp",
                       "date_cmp", "and", "or", "not"])
    if kind == "and" or kind == "or":
        (ca, sa) = _gen_predicate(rng, dom)
        (cb, sb) = _gen_predicate(rng, dom)
        if kind == "and":
            return ca & cb, f"(({sa}) AND ({sb}))"
        return ca | cb, f"(({sa}) OR ({sb}))"
    if kind == "not":
        (ca, sa) = _gen_predicate(rng, dom)
        return ~ca, f"(NOT ({sa}))"
    if kind == "status_eq":
        v = rng.choice(dom["o_orderstatus"])
        return F.col("o_orderstatus") == v, f"o_orderstatus = '{v}'"
    if kind == "prio_in":
        vs = rng.sample(dom["o_orderpriority"],
                        k=min(2, len(dom["o_orderpriority"])))
        lst = ", ".join(f"'{v}'" for v in vs)
        return F.col("o_orderpriority").isin(vs), f"o_orderpriority IN ({lst})"
    if kind == "key_range":
        lo, hi = dom["o_orderkey"]
        a = rng.randint(lo, hi)
        b = rng.randint(lo, hi)
        a, b = min(a, b), max(a, b)
        return (
            (F.col("o_orderkey") >= a) & (F.col("o_orderkey") <= b),
            f"(o_orderkey >= {a} AND o_orderkey <= {b})",
        )
    if kind == "price_cmp":
        lo, hi = dom["o_totalprice"]
        # integer-valued threshold: exact in both engines
        t = rng.randint(int(lo), int(hi))
        op = rng.choice(["<", ">="])
        col = F.col("o_totalprice")
        return (col < t) if op == "<" else (col >= t), f"o_totalprice {op} {t}"
    # date_cmp
    d0, d1 = dom["o_orderdate"]
    span = (d1 - d0).days or 1
    cut = d0 + datetime.timedelta(days=rng.randint(0, span))
    op = rng.choice(["<", ">="])
    col = F.to_date("o_orderdate")
    sql = f"CAST(o_orderdate AS DATE) {op} DATE '{cut.isoformat()}'"
    return (col < F.lit(cut.isoformat()).cast("date")) if op == "<" else (
        col >= F.lit(cut.isoformat()).cast("date")
    ), sql


_AGGS = [
    # (name, spark builder, sql text) - money through integer cents only
    ("cnt", lambda: F.count("*").alias("cnt"), "COUNT(*) AS cnt"),
    (
        "sum_cents",
        lambda: F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "sum_cents"
        ),
        "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_cents",
    ),
    (
        "min_price",
        lambda: F.min("o_totalprice").alias("min_price"),
        "MIN(o_totalprice) AS min_price",
    ),
    (
        "max_key",
        lambda: F.max("o_orderkey").alias("max_key"),
        "MAX(o_orderkey) AS max_key",
    ),
    (
        "n_cust",
        lambda: F.countDistinct("o_custkey").alias("n_cust"),
        "COUNT(DISTINCT o_custkey) AS n_cust",
    ),
    (
        "last_date",
        lambda: F.max(F.to_date("o_orderdate")).alias("last_date"),
        "MAX(CAST(o_orderdate AS DATE)) AS last_date",
    ),
]


def _canon(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def _cases():
    rng = random.Random(_SEED)
    return [(i, random.Random(rng.randrange(2**63))) for i in range(_N_CASES)]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("case_id,rng", _cases())
def test_differential_random_query(spark, sf_dir, duck, case_id, rng):
    dom = _domain(duck)
    pred_col, pred_sql = _gen_predicate(rng, dom)
    n_group = rng.choice([0, 1, 2])
    groups = rng.sample(_GROUPABLE, k=n_group)
    aggs = rng.sample(_AGGS, k=rng.randint(1, 3))

    orders = load(spark, sf_dir, "orders").filter(pred_col)
    if groups:
        sdf = orders.groupBy(*groups).agg(*[mk() for _, mk, _ in aggs])
    else:
        sdf = orders.agg(*[mk() for _, mk, _ in aggs])
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())

    sel = ", ".join(
        ([", ".join(groups)] if groups else [])
        + [sql for _, _, sql in aggs]
    )
    sql = f"SELECT {sel} FROM orders WHERE {pred_sql}"
    if groups:
        sql += f" GROUP BY {', '.join(groups)}"
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, sql, cols, ocols)
    assert got == want, (case_id, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:20])
def test_differential_random_join_having(spark, sf_dir, duck, case_id, rng):
    """Join + group + HAVING combinations: orders x customer on the
    customer key, grouped by nation, with a random HAVING cut."""
    dom = _domain(duck)
    pred_col, pred_sql = _gen_predicate(rng, dom)
    aggs = rng.sample(_AGGS, k=rng.randint(1, 2))
    min_cnt = rng.randint(1, 5)

    orders = load(spark, sf_dir, "orders").filter(pred_col)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sdf = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("grp_n"), *[mk() for _, mk, _ in aggs])
        .filter(F.col("grp_n") >= min_cnt)
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())

    agg_sql = ", ".join(sql for _, _, sql in aggs)
    sql = (
        "SELECT c_nationkey, COUNT(*) AS grp_n, "
        + agg_sql
        + " FROM orders JOIN customer ON o_custkey = c_custkey"
        + f" WHERE {pred_sql} GROUP BY c_nationkey"
        + f" HAVING COUNT(*) >= {min_cnt}"
    )
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, sql, cols, ocols)
    assert got == want, (case_id, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:20])
def test_differential_random_window(spark, sf_dir, duck, case_id, rng):
    """Window-function combinations: ranking / lag over random partitions
    and deterministic orders, with a rank cut (exercises the
    WindowGroupLimit path the plan audit certifies)."""
    from pyspark.sql import Window

    dom = _domain(duck)
    pred_col, pred_sql = _gen_predicate(rng, dom)
    part = rng.choice(["o_orderstatus", "o_orderpriority", "o_custkey"])
    func = rng.choice(["row_number", "rank", "lag"])
    k = rng.randint(1, 4)

    orders = load(spark, sf_dir, "orders").filter(pred_col)
    if func == "lag":
        w = Window.partitionBy(part).orderBy("o_orderdate", "o_orderkey")
        sdf = orders.select(
            "o_orderkey",
            F.lag(F.round(F.col("o_totalprice") * 100).cast("long"))
            .over(w)
            .alias("prev_cents"),
        )
        sql = (
            "SELECT o_orderkey, LAG(CAST(ROUND(o_totalprice * 100) AS"
            f" BIGINT)) OVER (PARTITION BY {part} ORDER BY o_orderdate,"
            " o_orderkey) AS prev_cents FROM orders WHERE "
            + pred_sql
        )
    else:
        if func == "row_number":
            # unique total order => deterministic row numbers
            order_cols = [F.col("o_orderkey")]
            order_sql = "o_orderkey"
            fn = F.row_number()
        else:
            # rank tolerates ties; order by a tie-prone column
            order_cols = [F.col("o_totalprice")]
            order_sql = "o_totalprice"
            fn = F.rank()
        w = Window.partitionBy(part).orderBy(*order_cols)
        sdf = (
            orders.select("o_orderkey", part, fn.over(w).alias("rk"))
            .filter(F.col("rk") <= k)
        )
        sql = (
            f"SELECT o_orderkey, {part}, rk FROM ("
            f"SELECT o_orderkey, {part}, {func.upper()}() OVER ("
            f"PARTITION BY {part} ORDER BY {order_sql}) AS rk"
            f" FROM orders WHERE {pred_sql}) WHERE rk <= {k}"
        )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:20])
def test_differential_random_setops(spark, sf_dir, duck, case_id, rng):
    """Set operations between two random filtered projections of orders:
    UNION / INTERSECT / EXCEPT and their ALL multiset twins."""
    dom = _domain(duck)
    pa_col, pa_sql = _gen_predicate(rng, dom)
    pb_col, pb_sql = _gen_predicate(rng, dom)
    op = rng.choice(
        ["union", "union_all", "intersect", "intersect_all",
         "except", "except_all"]
    )
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(pa_col).select("o_orderkey", "o_orderstatus")
    b = orders.filter(pb_col).select("o_orderkey", "o_orderstatus")
    sdf = {
        "union": lambda: a.union(b).distinct(),
        "union_all": lambda: a.unionAll(b),
        "intersect": lambda: a.intersect(b),
        "intersect_all": lambda: a.intersectAll(b),
        "except": lambda: a.subtract(b),
        "except_all": lambda: a.exceptAll(b),
    }[op]()
    sql_op = {
        "union": "UNION", "union_all": "UNION ALL",
        "intersect": "INTERSECT", "intersect_all": "INTERSECT ALL",
        "except": "EXCEPT", "except_all": "EXCEPT ALL",
    }[op]
    sql = (
        f"SELECT o_orderkey, o_orderstatus FROM orders WHERE {pa_sql}"
        f" {sql_op} "
        f"SELECT o_orderkey, o_orderstatus FROM orders WHERE {pb_sql}"
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


def _gen_lineitem_predicate(rng: random.Random) -> tuple[object, str]:
    kind = rng.choice(["flag", "status", "qty", "disc", "ship", "and", "or"])
    if kind in ("and", "or"):
        ca, sa = _gen_lineitem_predicate(rng)
        cb, sb = _gen_lineitem_predicate(rng)
        j = "AND" if kind == "and" else "OR"
        return (ca & cb) if kind == "and" else (ca | cb), f"(({sa}) {j} ({sb}))"
    if kind == "flag":
        v = rng.choice(["A", "N", "R"])
        return F.col("l_returnflag") == v, f"l_returnflag = '{v}'"
    if kind == "status":
        v = rng.choice(["O", "F"])
        return F.col("l_linestatus") == v, f"l_linestatus = '{v}'"
    if kind == "qty":
        t = rng.randint(1, 50)
        op = rng.choice(["<=", ">"])
        c = F.col("l_quantity")
        return (c <= t) if op == "<=" else (c > t), f"l_quantity {op} {t}"
    if kind == "disc":
        # discounts are 0.00-0.10 two-decimal doubles; integer-percent cuts
        # are exact in both engines
        t = rng.randint(0, 10)
        return (
            F.round(F.col("l_discount") * 100).cast("long") >= t,
            f"CAST(ROUND(l_discount * 100) AS BIGINT) >= {t}",
        )
    # ship date cut
    y = rng.randint(1992, 1998)
    m = rng.randint(1, 12)
    cut = f"{y:04d}-{m:02d}-01"
    op = rng.choice(["<", ">="])
    col = F.to_date("l_shipdate")
    sql = f"CAST(l_shipdate AS DATE) {op} DATE '{cut}'"
    return (col < F.lit(cut).cast("date")) if op == "<" else (
        col >= F.lit(cut).cast("date")
    ), sql


_LI_AGGS = [
    ("n", lambda: F.count("*").alias("n"), "COUNT(*) AS n"),
    (
        "rev_cents",
        lambda: F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_cents"),
        "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_cents",
    ),
    (
        "qty_sum",
        lambda: F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
        "SUM(CAST(l_quantity AS BIGINT)) AS qty_sum",
    ),
    (
        "n_parts",
        lambda: F.countDistinct("l_partkey").alias("n_parts"),
        "COUNT(DISTINCT l_partkey) AS n_parts",
    ),
]


@pytest.mark.parametrize("case_id,rng", _cases()[:20])
def test_differential_random_lineitem(spark, sf_dir, duck, case_id, rng):
    """The widest fact table: random predicates over flags/quantities/
    discounts/ship dates with disjunctions, grouped by the TPC-H q1 keys
    - revenue stays in integer cents x integer basis points (exact)."""
    pred_col, pred_sql = _gen_lineitem_predicate(rng)
    groups = rng.choice(
        [[], ["l_returnflag"], ["l_returnflag", "l_linestatus"]]
    )
    aggs = rng.sample(_LI_AGGS, k=rng.randint(1, 3))
    li = load(spark, sf_dir, "lineitem").filter(pred_col)
    if groups:
        sdf = li.groupBy(*groups).agg(*[mk() for _, mk, _ in aggs])
    else:
        sdf = li.agg(*[mk() for _, mk, _ in aggs])
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    sel = ", ".join(
        ([", ".join(groups)] if groups else []) + [s for _, _, s in aggs]
    )
    sql = f"SELECT {sel} FROM lineitem WHERE {pred_sql}"
    if groups:
        sql += f" GROUP BY {', '.join(groups)}"
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


def _gen_docs_predicate(rng: random.Random, langs, sources) -> tuple[object, str]:
    kind = rng.choice(["lang", "source_in", "len", "word", "and", "or"])
    if kind in ("and", "or"):
        ca, sa = _gen_docs_predicate(rng, langs, sources)
        cb, sb = _gen_docs_predicate(rng, langs, sources)
        j = "AND" if kind == "and" else "OR"
        return (ca & cb) if kind == "and" else (ca | cb), f"(({sa}) {j} ({sb}))"
    if kind == "lang":
        v = rng.choice(langs)
        return F.col("lang") == v, f"lang = '{v}'"
    if kind == "source_in":
        vs = rng.sample(sources, k=min(3, len(sources)))
        lst = ", ".join(f"'{v}'" for v in vs)
        return F.col("source").isin(vs), f"source IN ({lst})"
    if kind == "len":
        t = rng.randint(10, 2000)
        op = rng.choice(["<", ">="])
        c = F.col("n_chars")
        return (c < t) if op == "<" else (c >= t), f"n_chars {op} {t}"
    # word: substring containment in the lowered text
    w = rng.choice(["the", "data", "city", "a", "zz"])
    return (
        F.lower(F.col("text")).contains(w),
        f"contains(lower(text), '{w}')",
    )


@pytest.mark.parametrize("case_id,rng", _cases()[:20])
def test_differential_random_documents(spark, sf_dir, duck, case_id, rng):
    """String-layer combinations over the corpus table: language/source/
    length/substring predicates with token-count aggregates through the
    repo's shared split convention (split(lower(trim(text)), '\\s+') ==
    DuckDB string_split_regex)."""
    langs = [r[0] for r in duck.execute(
        "SELECT DISTINCT lang FROM documents ORDER BY 1").fetchall()]
    sources = [r[0] for r in duck.execute(
        "SELECT DISTINCT source FROM documents ORDER BY 1").fetchall()]
    pred_col, pred_sql = _gen_docs_predicate(rng, langs, sources)
    group = rng.choice([None, "lang", "source"])

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .filter(pred_col)
    )
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars"),
        F.sum(
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        ).alias("tokens"),
        F.countDistinct("doc_id").alias("n_ids"),
    ]
    sdf = docs.groupBy(group).agg(*aggs) if group else docs.agg(*aggs)
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())

    sel = (
        ([group] if group else [])
        + [
            "COUNT(*) AS n_docs",
            "SUM(n_chars) AS chars",
            "SUM(len(string_split_regex(lower(trim(text)), '\\s+')))"
            " AS tokens",
            "COUNT(DISTINCT doc_id) AS n_ids",
        ]
    )
    sql = (
        f"SELECT {', '.join(sel)} FROM documents "
        f"WHERE text IS NOT NULL AND trim(text) <> '' AND ({pred_sql})"
    )
    if group:
        sql += f" GROUP BY {group}"
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_embeddings(spark, sf_dir, duck, case_id, rng):
    """Vector-layer combinations: array-element access and pinned-integer
    element aggregates over the embeddings table (the repo's micro-unit
    quantization convention), grouped by label or global."""
    j = rng.randint(0, 63)  # 0-based element
    t = rng.randint(1, 500)
    group = rng.choice([None, "label"])
    op = rng.choice(["<", ">="])

    emb = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label", "cast(embedding as array<double>) as e"
    )
    pred = (
        F.col("vec_id") % 1000 < t if op == "<" else F.col("vec_id") % 1000 >= t
    )
    pred_sql = f"vec_id % 1000 {op} {t}"
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.round(F.col("e")[j] * 1e6).cast("long")).alias("elem_q"),
        F.min(F.col("e")[j]).alias("elem_min"),
        F.max(F.col("e")[j]).alias("elem_max"),
    ]
    base = emb.filter(pred)
    sdf = base.groupBy(group).agg(*aggs) if group else base.agg(*aggs)
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())

    sel = (
        ([group] if group else [])
        + [
            "COUNT(*) AS n",
            f"SUM(CAST(ROUND(embedding[{j + 1}]::DOUBLE * 1e6) AS BIGINT))"
            " AS elem_q",
            f"MIN(embedding[{j + 1}]::DOUBLE) AS elem_min",
            f"MAX(embedding[{j + 1}]::DOUBLE) AS elem_max",
        ]
    )
    sql = f"SELECT {', '.join(sel)} FROM embeddings WHERE {pred_sql}"
    if group:
        sql += f" GROUP BY {group}"
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_topk(spark, sf_dir, duck, case_id, rng):
    """Sort/limit combinations: random predicate, random deterministic
    sort (unique tiebreaker), random k - the TakeOrderedAndProject
    surface."""
    dom = _domain(duck)
    pred_col, pred_sql = _gen_predicate(rng, dom)
    k = rng.randint(1, 25)
    sort_key, sort_sql = rng.choice(
        [
            ([F.desc("o_totalprice"), F.asc("o_orderkey")],
             "o_totalprice DESC, o_orderkey"),
            ([F.asc("o_orderdate"), F.asc("o_orderkey")],
             "o_orderdate, o_orderkey"),
            ([F.desc("o_orderkey")], "o_orderkey DESC"),
        ]
    )
    sdf = (
        load(spark, sf_dir, "orders")
        .filter(pred_col)
        .orderBy(*sort_key)
        .limit(k)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    sql = (
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"
        f" WHERE {pred_sql} ORDER BY {sort_sql} LIMIT {k}"
    )
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_three_table_join(spark, sf_dir, duck, case_id, rng):
    """3-table chains (lineitem x orders x customer): random predicates on
    two tables, revenue in exact integer cents x basis points, grouped by
    nation - exercises Catalyst join ordering against DuckDB's."""
    dom = _domain(duck)
    opred_col, opred_sql = _gen_predicate(rng, dom)
    lpred_col, lpred_sql = _gen_lineitem_predicate(rng)

    li = load(spark, sf_dir, "lineitem").filter(lpred_col)
    orders = load(spark, sf_dir, "orders").filter(opred_col)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sdf = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("rev_cents"),
        )
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    sql = (
        "SELECT c_nationkey, COUNT(*) AS n,"
        " SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_cents"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        f" WHERE ({lpred_sql}) AND ({opred_sql})"
        " GROUP BY c_nationkey"
    )
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_events_timebuckets(spark, sf_dir, duck, case_id, rng):
    """Time-bucketed groupings over the event stream: random type/user
    predicates, date_trunc at random granularity, integer-cents value
    sums - the batch face of the streaming window family."""
    etypes = ["click", "error", "purchase", "signup", "view"]
    kind = rng.choice(["type", "type_in", "user_mod"])
    if kind == "type":
        v = rng.choice(etypes)
        pred_col, pred_sql = F.col("event_type") == v, f"event_type = '{v}'"
    elif kind == "type_in":
        vs = rng.sample(etypes, k=2)
        pred_col = F.col("event_type").isin(vs)
        pred_sql = "event_type IN ({})".format(
            ", ".join(f"'{v}'" for v in vs)
        )
    else:
        m = rng.randint(2, 7)
        pred_col = F.col("user_id") % m == 0
        pred_sql = f"user_id % {m} = 0"
    gran = rng.choice(["month", "week", "day"])

    ev = load(spark, sf_dir, "events").filter(pred_col)
    sdf = (
        ev.groupBy(
            F.date_trunc(gran, "ts").cast("date").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "val_cents"
            ),
            F.countDistinct("user_id").alias("users"),
        )
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    sql = (
        f"SELECT CAST(DATE_TRUNC('{gran}', ts) AS DATE) AS bucket,"
        " COUNT(*) AS n,"
        " SUM(CAST(ROUND(value * 100) AS BIGINT)) AS val_cents,"
        " COUNT(DISTINCT user_id) AS users"
        f" FROM events WHERE {pred_sql} GROUP BY 1"
    )
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_part_supplier(spark, sf_dir, duck, case_id, rng):
    """Dimension-side combinations: part size/brand/type-prefix predicates
    grouped by brand, and supplier balance aggregates joined to nation -
    covers the two tables the other batches never touch."""
    side = rng.choice(["part", "supplier"])
    if side == "part":
        sz = rng.randint(1, 50)
        op = rng.choice(["<=", ">"])
        prefix = rng.choice(["STANDARD", "SMALL", "MEDIUM", "LARGE",
                             "ECONOMY", "PROMO"])
        pred_col = (
            (F.col("p_size") <= sz) if op == "<=" else (F.col("p_size") > sz)
        ) & F.col("p_type").startswith(prefix)
        pred_sql = (
            f"p_size {op} {sz} AND starts_with(p_type, '{prefix}')"
        )
        sdf = (
            load(spark, sf_dir, "part")
            .filter(pred_col)
            .groupBy("p_brand")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.round(F.col("p_retailprice") * 100).cast("long")
                ).alias("price_cents"),
                F.max("p_size").alias("max_size"),
            )
        )
        sql = (
            "SELECT p_brand, COUNT(*) AS n,"
            " SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS price_cents,"
            f" MAX(p_size) AS max_size FROM part WHERE {pred_sql}"
            " GROUP BY p_brand"
        )
    else:
        t = rng.randint(-999, 9999)
        pred_col = F.col("s_acctbal") >= t
        pred_sql = f"s_acctbal >= {t}"
        sup = load(spark, sf_dir, "supplier").filter(pred_col)
        nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        sdf = (
            sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
            .groupBy("n_name")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.round(F.col("s_acctbal") * 100).cast("long")
                ).alias("bal_cents"),
            )
        )
        sql = (
            "SELECT n_name, COUNT(*) AS n,"
            " SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS bal_cents"
            " FROM supplier JOIN nation ON s_nationkey = n_nationkey"
            f" WHERE {pred_sql} GROUP BY n_name"
        )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:30])
def test_differential_random_range_frames(spark, sf_dir, duck, case_id, rng):
    """RANGE-frame windows (round 8, VERDICT r7 #5): value-based frames
    over random partitions, order values, and bounds — the frame family
    the fixed oracles pin only at chosen parameters. RANGE frames are
    tie-safe by construction (the frame is defined by the ORDER value,
    not row position), so any aggregate over them is deterministic."""
    from pyspark.sql import Window

    dom = _domain(duck)
    pred_col, pred_sql = _gen_predicate(rng, dom)
    part = rng.choice(_GROUPABLE)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cents_sql = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
    if rng.random() < 0.5:
        oval = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        oval_sql = "datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
        lo = rng.randint(1, 90)
        hi = rng.choice([0, rng.randint(1, 45)])
    else:
        oval = F.col("o_custkey")
        oval_sql = "o_custkey"
        lo = rng.randint(1, 500)
        hi = rng.choice([0, rng.randint(1, 250)])
    agg_name = rng.choice(["sum", "count", "min", "max"])
    if agg_name == "count":
        expr, expr_sql = F.count(F.lit(1)), "COUNT(*)"
    else:
        expr = getattr(F, agg_name)(cents)
        expr_sql = f"{agg_name.upper()}({cents_sql})"
    hi_sql = "CURRENT ROW" if hi == 0 else f"{hi} FOLLOWING"
    # descending RANGE: PRECEDING/FOLLOWING walk along the sort direction
    # in both engines (SQL standard) — a corner the fixed oracles never hit
    desc = rng.random() < 0.3
    order = F.desc(oval) if desc else oval
    oval_sql = f"{oval_sql} DESC" if desc else oval_sql
    w = (
        Window.partitionBy(part)
        .orderBy(order)
        .rangeBetween(-lo, hi)
    )
    orders = load(spark, sf_dir, "orders").filter(pred_col)
    sdf = orders.select("o_orderkey", expr.over(w).alias("v"))
    sql = (
        f"SELECT o_orderkey, {expr_sql} OVER (PARTITION BY {part} "
        f"ORDER BY {oval_sql} RANGE BETWEEN {lo} PRECEDING AND {hi_sql}) "
        f"AS v FROM orders WHERE {pred_sql}"
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())
    assert sorted(ocols) == cols and got == want, (case_id, sql)


def _param_minhash_sig_sql(k: int, num_perm: int) -> str:
    from nyc_analytics_database_platform_spark.queries.llm_dedup import (
        _shingle_cte,
    )

    sig_cols = ", ".join(
        f"MIN(md5('{p}:' || s)) AS m{p}" for p in range(num_perm)
    )
    return (
        f"WITH {_shingle_cte(k)} "
        f"SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id ORDER BY doc_id"
    )


def _param_minhash_pairs_sql(k: int, num_perm: int, rows_per_band: int) -> str:
    from nyc_analytics_database_platform_spark.queries.llm_dedup import (
        _shingle_cte,
    )

    sig_cols = ", ".join(
        f"MIN(md5('{p}:' || s)) AS m{p}" for p in range(num_perm)
    )
    num_bands = num_perm // rows_per_band
    cases = " ".join(
        "WHEN {b} THEN md5({cat})".format(
            b=b,
            cat=" || ".join(
                f"m{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(num_bands)
    )
    return f"""
        WITH {_shingle_cte(k)},
        sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
        bands AS (
            SELECT doc_id, bnd, CASE bnd {cases} END AS bucket
            FROM sig,
                 (SELECT unnest(generate_series(0, {num_bands - 1})) AS bnd) g
        )
        SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM bands x
        JOIN bands y ON x.bnd = y.bnd AND x.bucket = y.bucket
                    AND x.doc_id < y.doc_id
        ORDER BY a_id, b_id
    """


@pytest.mark.parametrize("case_id,rng", _cases()[:25])
def test_differential_random_minhash(spark, sf_dir, duck, case_id, rng):
    """Shingle/MinHash/LSH pipelines at RANDOM parameters (round 8,
    VERDICT r7 #5): shingle width k, permutation count, and band width
    are drawn per case and the whole pipeline — signature table or
    banded candidate pairs — is re-derived in DuckDB from the same
    md5('p:' || shingle) convention. The fixed oracles pin (k=5, 12
    perms, 2-row bands); this explores the parameter space."""
    from nyc_analytics_database_platform_spark.catalog import (
        clear_engine_state,
    )
    from nyc_analytics_database_platform_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    k = rng.choice([2, 3, 4, 6])
    num_perm = rng.choice([4, 6, 8, 12])
    docs = load(spark, sf_dir, "documents")
    try:
        if rng.random() < 0.5:
            sdf = minhash_signatures(docs, num_perm=num_perm, k=k)
            sql = _param_minhash_sig_sql(k, num_perm)
        else:
            rows_per_band = rng.choice(
                [r for r in (1, 2, 3, 4) if num_perm % r == 0]
            )
            sigs = minhash_signatures(docs, num_perm=num_perm, k=k)
            sdf = lsh_candidate_pairs(
                sigs, num_perm=num_perm, rows_per_band=rows_per_band
            )
            sql = _param_minhash_pairs_sql(k, num_perm, rows_per_band)
        cols = sorted(sdf.columns)
        got = Counter(
            tuple(_canon(r[c]) for c in cols) for r in sdf.collect()
        )
        cur = duck.execute(sql)
        ocols = [d[0] for d in cur.description]
        idx = [ocols.index(c) for c in sorted(ocols)]
        want = Counter(
            tuple(_canon(row[i]) for i in idx) for row in cur.fetchall()
        )
        assert sorted(ocols) == cols and got == want, (
            case_id,
            k,
            num_perm,
        )
    finally:
        # banded_buckets caches its band index per call; 25 cases in one
        # session would otherwise pile up resident blocks
        clear_engine_state(spark)


_GROUPING_COLS = ["o_orderstatus", "o_orderpriority", "ck_bucket"]


@pytest.mark.parametrize("case_id,rng", _cases()[:25])
def test_differential_random_grouping_sets(spark, sf_dir, duck, case_id, rng):
    """Multi-granularity aggregation fuzz (round 8): random ROLLUP / CUBE /
    GROUPING SETS over status, priority, and a derived customer bucket,
    with grouping_id() disambiguating super-aggregate NULLs. The DataFrame
    rendering (df.rollup / df.cube / df.groupingSets) and the SQL rendering
    must agree bit-for-bit including the GROUPING bitmask convention."""
    dom = _domain(duck)
    pred_col, pred_sql = _gen_predicate(rng, dom)
    cols = rng.sample(_GROUPING_COLS, k=rng.choice([2, 3]))
    aggs = rng.sample(_AGGS, k=rng.randint(1, 2))
    form = rng.choice(["rollup", "cube", "gsets"])

    orders = (
        load(spark, sf_dir, "orders")
        .filter(pred_col)
        .withColumn("ck_bucket", F.col("o_custkey") % 7)
    )
    agg_cols = [F.grouping_id().alias("gid")] + [mk() for _, mk, _ in aggs]
    if form == "rollup":
        sdf = orders.rollup(*cols).agg(*agg_cols)
        group_sql = f"ROLLUP ({', '.join(cols)})"
    elif form == "cube":
        sdf = orders.cube(*cols).agg(*agg_cols)
        group_sql = f"CUBE ({', '.join(cols)})"
    else:
        n_sets = rng.randint(1, 3)
        # the full set is always a member so every grouping column appears
        # in >=1 set (DuckDB's GROUPING() binder requires it; Spark would
        # accept an all-NULL grouping column, a shape nobody writes)
        seen: list[list[str]] = [list(cols)]
        for _ in range(n_sets):
            subset = [c for c in cols if rng.random() < 0.6]
            if subset not in seen:
                seen.append(subset)
        sdf = orders.groupingSets(seen, *cols).agg(*agg_cols)
        rendered = ", ".join(
            "(" + ", ".join(s) + ")" if s else "()" for s in seen
        )
        group_sql = f"GROUPING SETS ({rendered})"

    got_cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in got_cols) for r in sdf.collect())

    agg_sql = ", ".join(sql for _, _, sql in aggs)
    sql = (
        f"SELECT {', '.join(cols)}, GROUPING({', '.join(cols)}) AS gid, "
        + agg_sql
        + " FROM (SELECT *, o_custkey % 7 AS ck_bucket FROM orders"
        + f" WHERE {pred_sql})"
        + f" GROUP BY {group_sql}"
    )
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == got_cols, (case_id, sql, got_cols, ocols)
    assert got == want, (case_id, form, sql)


@pytest.fixture(scope="module")
def sql_views(spark, sf_dir):
    """Temp views for the subquery family: the SAME SQL text runs on
    spark.sql and DuckDB."""
    for t in ("orders", "customer", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"fz_{t}")
    yield
    for t in ("orders", "customer", "lineitem"):
        spark.catalog.dropTempView(f"fz_{t}")


_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


@pytest.mark.parametrize("case_id,rng", _cases()[:25])
def test_differential_random_subqueries(spark, sf_dir, duck, sql_views,
                                        case_id, rng):
    """Subquery decorrelation fuzz (round 8): scalar-aggregate thresholds,
    (NOT) IN, (NOT) EXISTS, and correlated scalar subqueries — one ANSI
    SQL text rendered per case and executed verbatim by BOTH engines
    (Catalyst's RewriteSubquery/DecorrelateInnerQuery path vs DuckDB's
    flattening). Aggregate thresholds stay in exact integer cents or
    identical-operand double division, so no boundary row can flip on a
    last-ulp difference."""
    dom = _domain(duck)
    _, pred_sql = _gen_predicate(rng, dom)
    shape = rng.choice(["scalar_agg", "in", "not_in", "exists",
                        "not_exists", "corr_scalar"])

    if shape == "scalar_agg":
        thr = rng.choice([
            f"(SELECT MAX({_CENTS}) FROM orders WHERE {pred_sql}) / 2",
            f"(SELECT MIN({_CENTS}) FROM orders WHERE {pred_sql}) * 2",
            f"(SELECT SUM({_CENTS}) / COUNT(*) FROM orders WHERE {pred_sql})",
        ])
        sql = (
            "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders "
            f"WHERE {_CENTS} > {thr} GROUP BY o_orderstatus"
        )
    elif shape in ("in", "not_in"):
        bal = round(rng.uniform(-500.0, 8000.0), 2)
        op = "IN" if shape == "in" else "NOT IN"
        sql = (
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM orders WHERE ({pred_sql}) AND o_custkey {op} "
            f"(SELECT c_custkey FROM customer WHERE c_acctbal < {bal}) "
            "GROUP BY o_orderpriority"
        )
    elif shape in ("exists", "not_exists"):
        op = "EXISTS" if shape == "exists" else "NOT EXISTS"
        sql = (
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust "
            f"FROM customer c WHERE {op} (SELECT 1 FROM orders o "
            f"WHERE o.o_custkey = c.c_custkey AND ({pred_sql})) "
            "GROUP BY c_nationkey"
        )
    else:
        k = rng.randint(1, 60)
        sql = (
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust "
            "FROM customer c "
            f"WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * {k} > "
            f"(SELECT COALESCE(MAX({_CENTS}), 0) FROM orders o "
            "WHERE o.o_custkey = c.c_custkey) "
            "GROUP BY c_nationkey"
        )

    spark_sql = (
        sql.replace("FROM orders", "FROM fz_orders")
        .replace("FROM customer", "FROM fz_customer")
    )
    sdf = spark.sql(spark_sql)
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())

    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, sql, cols, ocols)
    assert got == want, (case_id, shape, sql)


@pytest.mark.parametrize("case_id,rng", _cases()[:20])
def test_differential_random_asof_join(spark, sf_dir, duck, case_id, rng):
    """As-of join fuzz (round 8): random left/right event-type subsets,
    predicate, and DIRECTION (backward latest <= / forward earliest >=)
    against DuckDB's native ASOF JOIN. The right side is deduped to one
    row per (user_id, ts) so tie-breaking is well-defined in both engines;
    the scalable union+window implementation must reproduce the reference
    semantics exactly, including left-outer NULLs for rows with no match."""
    from nyc_analytics_database_platform_spark.operators.joins import (
        asof_join,
        asof_join_forward,
    )

    types = ["click", "error", "purchase", "signup", "view"]
    lt = rng.sample(types, k=rng.randint(1, 2))
    rt = rng.sample(types, k=rng.randint(1, 2))
    vmin = round(rng.uniform(0.0, 50.0), 2)
    forward = rng.random() < 0.5

    events = load(spark, sf_dir, "events")
    l = events.filter(
        F.col("event_type").isin(lt) & (F.col("value") >= vmin)
    ).select("event_id", "user_id", "ts")
    r = (
        events.filter(F.col("event_type").isin(rt))
        .groupBy("user_id", "ts")
        .agg(
            F.max(F.round(F.col("value") * 100).cast("long")).alias("v_cents")
        )
    )
    fn = asof_join_forward if forward else asof_join
    sdf = fn(
        l, r, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["ts", "v_cents"],
    ).select(
        "event_id",
        F.unix_micros("asof_ts").alias("asof_us"),
        F.col("asof_v_cents").alias("v_cents"),
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    lt_sql = ", ".join(f"'{t}'" for t in lt)
    rt_sql = ", ".join(f"'{t}'" for t in rt)
    op = ">=" if forward else "<="
    sql = f"""
        WITH l AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type IN ({lt_sql}) AND value >= {vmin}),
             r AS (SELECT user_id, ts,
                          MAX(CAST(ROUND(value * 100) AS BIGINT)) AS v_cents
                   FROM events WHERE event_type IN ({rt_sql})
                   GROUP BY user_id, ts)
        SELECT l.event_id, epoch_us(r.ts) AS asof_us, r.v_cents
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts {op} l.ts
    """
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, forward, lt, rt, vmin)


@pytest.mark.parametrize("case_id,rng", _cases()[:20])
def test_differential_random_sessionize(spark, sf_dir, duck, case_id, rng):
    """Sessionization fuzz (round 8): random gap threshold, event-type
    subset, and value predicate; per-session stats (count / first ts /
    cents sum) re-derived in DuckDB via lag + running-sum windows. Pins
    the gap-boundary semantics (a gap of EXACTLY gap_seconds starts a new
    session) and the (ts, event_id) tie-break at equal timestamps."""
    from nyc_analytics_database_platform_spark.operators.sessions import (
        sessionize,
    )

    types = ["click", "error", "purchase", "signup", "view"]
    et = rng.sample(types, k=rng.randint(1, 3))
    vmin = round(rng.uniform(0.0, 60.0), 2)
    gap = rng.choice([60, 300, 900, 3600, 14400, 86400])

    events = load(spark, sf_dir, "events")
    e = events.filter(
        F.col("event_type").isin(et) & (F.col("value") >= vmin)
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    sdf = (
        sessionize(e, "user_id", "ts", gap, order_cols=("event_id",))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.sum("v_cents").alias("sum_cents"),
        )
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    et_sql = ", ".join(f"'{t}'" for t in et)
    sql = f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CAST(ROUND(value * 100) AS BIGINT) AS v_cents
            FROM events
            WHERE event_type IN ({et_sql}) AND value >= {vmin}
        ),
        m AS (
            SELECT *,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w >= {gap * 1_000_000}
                        THEN 1 ELSE 0 END AS ns
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        s AS (
            SELECT *, SUM(ns) OVER (
                PARTITION BY user_id ORDER BY us, event_id
                ROWS UNBOUNDED PRECEDING
            ) AS session_seq
            FROM m
        )
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               MIN(us) AS first_us, SUM(v_cents) AS sum_cents
        FROM s GROUP BY user_id, session_seq
    """
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, et, vmin, gap)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_range_band_join(spark, sf_dir, duck, case_id,
                                             rng):
    """Range-band join fuzz (round 8): random monotone price cut points
    form half-open [lo, hi) bands; orders join bands on
    lo <= o_totalprice < hi (broadcast nested-loop on the Spark side) and
    aggregate per band. Pins the half-open boundary convention and that
    out-of-band rows drop (inner semantics) for arbitrary band layouts."""
    from nyc_analytics_database_platform_spark.operators.joins import (
        range_band_join,
    )

    lo_d, hi_d = duck.execute(
        "SELECT MIN(o_totalprice), MAX(o_totalprice) FROM orders"
    ).fetchone()
    n_bands = rng.randint(2, 5)
    cuts = sorted(
        round(rng.uniform(lo_d, hi_d), 2) for _ in range(n_bands + 1)
    )
    if len(set(cuts)) != len(cuts):  # pragma: no cover - ~0 at double res
        cuts = [c + i * 0.01 for i, c in enumerate(cuts)]
    bands = [(f"b{i:02d}", cuts[i], cuts[i + 1]) for i in range(n_bands)]
    status = rng.choice(["O", "F", "P", None])

    orders = load(spark, sf_dir, "orders")
    if status is not None:
        orders = orders.filter(F.col("o_orderstatus") == status)
    bdf = spark.createDataFrame(bands, "label string, lo double, hi double")
    sdf = (
        range_band_join(orders, bdf, F.col("o_totalprice"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents"),
        )
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    vals = ", ".join(f"('{l}', {lo}, {hi})" for l, lo, hi in bands)
    where = f"WHERE o_orderstatus = '{status}'" if status else ""
    sql = f"""
        WITH b(label, lo, hi) AS (VALUES {vals})
        SELECT b.label, COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM (SELECT * FROM orders {where}) o
        JOIN b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.label
    """
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, bands, status)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_percentile_cont(spark, sf_dir, duck, case_id,
                                             rng):
    """Continuous-percentile fuzz (round 8): random p, grouping column and
    predicate; Spark's exact percentile() vs DuckDB's quantile_cont. Pins
    the linear-interpolation convention (index = p*(n-1), lo + frac*(hi-lo)
    in double) at arbitrary p over integer cents - the fixed oracles only
    ever pin p=0.5. The pct column is compared with a 1e-12 relative
    tolerance (not exact repr) so a future engine upgrade that changes
    last-ulp interpolation rounding can't fail spuriously; the grouping
    key and count stay exact."""
    p = round(rng.choice([0.1, 0.25, 0.37, 0.5, 0.63, 0.75, 0.9, 0.99]), 2)
    grp = rng.choice(["o_orderstatus", "o_orderpriority"])
    klo = rng.randrange(0, 1000)

    orders = load(spark, sf_dir, "orders")
    sdf = (
        orders.filter(F.col("o_custkey") >= klo)
        .select(
            grp, F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
        )
        .groupBy(grp)
        .agg(
            F.percentile("c", p).alias("pct"),
            F.count("*").alias("n"),
        )
    )
    got = {r_[grp]: (r_["pct"], r_["n"]) for r_ in sdf.collect()}

    sql = f"""
        SELECT {grp}, quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT),
                                    {p}) AS pct,
               COUNT(*) AS n
        FROM orders WHERE o_custkey >= {klo}
        GROUP BY {grp}
    """
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    want = {row[ocols.index(grp)]: (row[ocols.index("pct")],
                                    row[ocols.index("n")])
            for row in cur.fetchall()}

    assert sorted(ocols) == sorted(sdf.columns), (case_id, ocols)
    assert set(got) == set(want), (case_id, p, grp, klo)
    for k in got:
        gp, gn = got[k]
        wp, wn = want[k]
        assert gn == wn, (case_id, k, gn, wn)
        assert math.isclose(float(gp), float(wp),
                            rel_tol=1e-12, abs_tol=1e-9), (case_id, k, gp, wp)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_pivot(spark, sf_dir, duck, case_id, rng):
    """Pivot fuzz (round 8): random (group, pivot) column pair, random
    explicit pivot-value subset, random aggregate and predicate; DuckDB
    re-derives each pivot cell as a FILTERed aggregate. Pins Spark's
    pivot convention that an EMPTY (group, value) combo is NULL - even
    for count - which the oracle expresses as NULLIF(COUNT FILTER, 0)."""
    g, p = rng.sample(["o_orderstatus", "o_orderpriority"], k=2)
    dom = _domain(duck)
    vals = sorted(rng.sample(dom[p], k=rng.randint(2, min(4, len(dom[p])))))
    klo = rng.randrange(0, 1200)
    agg = rng.choice(["cnt", "sum_cents", "min_price"])

    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") >= klo)
    if agg == "cnt":
        sagg = F.count(F.lit(1))
        cell = "NULLIF(COUNT(*) FILTER (WHERE {c}), 0)"
    elif agg == "sum_cents":
        sagg = F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        cell = ("SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) "
                "FILTER (WHERE {c})")
    else:
        sagg = F.min("o_totalprice")
        cell = "MIN(o_totalprice) FILTER (WHERE {c})"

    sdf = orders.groupBy(g).pivot(p, vals).agg(sagg)
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    cells = ", ".join(
        cell.format(c=f"{p} = '{v}'") + f' AS "{v}"' for v in vals
    )
    sql = (
        f"SELECT {g}, {cells} FROM orders "
        f"WHERE o_custkey >= {klo} GROUP BY {g}"
    )
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, g, p, vals, agg, klo)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_scd2_point_in_time(spark, sf_dir, duck,
                                                case_id, rng):
    """SCD2 fuzz (round 8): random change-log subset collapsed into
    validity intervals (operators/scd.scd2_intervals), probed at a random
    point in time; DuckDB re-derives the lag-change/lead-close windows.
    Pins the [valid_from, valid_to) half-open convention (a probe AT a
    change instant sees the NEW row), null-open current rows, and the
    run-collapse rule (only attribute CHANGES open a version)."""
    from nyc_analytics_database_platform_spark.operators.scd import (
        scd2_intervals,
    )

    types = ["click", "error", "purchase", "signup", "view"]
    et = rng.sample(types, k=rng.randint(2, 4))
    vmin = round(rng.uniform(0.0, 40.0), 2)
    t0, t1 = duck.execute("SELECT MIN(ts), MAX(ts) FROM events").fetchone()
    probe = t0 + (t1 - t0) * rng.uniform(0.05, 0.95)
    probe_sql = probe.strftime("%Y-%m-%d %H:%M:%S.%f")

    events = load(spark, sf_dir, "events")
    log = (
        events.filter(
            F.col("event_type").isin(et) & (F.col("value") >= vmin)
        )
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("attr"))
    )
    iv = scd2_intervals(log, "user_id", "ts", ("attr",))
    sdf = iv.filter(
        (F.col("valid_from") <= F.lit(probe_sql).cast("timestamp"))
        & (
            F.col("valid_to").isNull()
            | (F.col("valid_to") > F.lit(probe_sql).cast("timestamp"))
        )
    ).select("user_id", "attr", "version", "is_current")
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    et_sql = ", ".join(f"'{t}'" for t in et)
    sql = f"""
        WITH d AS (
            SELECT user_id, ts, MAX(event_type) AS attr
            FROM events
            WHERE event_type IN ({et_sql}) AND value >= {vmin}
            GROUP BY user_id, ts
        ),
        c AS (
            SELECT *, lag(attr) OVER w AS prev, lag(ts) OVER w AS prev_ts
            FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        ch AS (
            SELECT user_id, ts, attr FROM c
            WHERE prev_ts IS NULL OR attr IS DISTINCT FROM prev
        ),
        iv AS (
            SELECT user_id, attr, ts AS valid_from,
                   lead(ts) OVER w2 AS valid_to,
                   CAST(row_number() OVER w2 AS INTEGER) AS version
            FROM ch WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)
        )
        SELECT user_id, attr, version, valid_to IS NULL AS is_current
        FROM iv
        WHERE valid_from <= TIMESTAMP '{probe_sql}'
          AND (valid_to IS NULL OR valid_to > TIMESTAMP '{probe_sql}')
    """
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, et, vmin, probe_sql)


# ---------------------------------------------------------------------------
# STREAMING differential fuzz (round 9, VERDICT r8 #6): the executed
# watermark semantics get the same randomized treatment as the batch
# families. Each case stages the events table as 3 micro-batch files with
# RANDOM split days, a RANDOM watermark delay / window size, and a RANDOM
# replayed-late range, then drains the real streaming engine
# (availableNow, file source, append mode) and compares against a batch
# oracle that states the expected semantics declaratively: per-window
# counts WITHOUT replay inflation, restricted to watermark-closed windows.
# Constraints keep every case deterministic (replayed windows provably
# closed at replay time): replay_end + window_days + delay < split2.

def _stream_scratch(case_id: str) -> tuple[str, str, str]:
    import tempfile

    scratch = os.path.join(
        tempfile.gettempdir(), "spark_graft_fuzz_stream", case_id
    )
    return scratch, os.path.join(scratch, "files"), os.path.join(scratch, "ckpt")


@pytest.mark.parametrize("case_id,rng", _cases()[:8])
def test_differential_random_watermark_late_drop(spark, sf_dir, duck,
                                                 case_id, rng):
    """Randomized watermark/late-drop: window size W in {1,2} days, delay
    D in {1..3} days, random batch split days (s1, s2), random replayed
    range (days <= r). The engine must drop every replayed row (its
    window closed before the replay batch) and append exactly the
    windows closed by the final watermark."""
    from nyc_analytics_database_platform_spark.queries.streaming_stateful import (
        _stage_ordered_files,
        drain_or_raise,
    )

    W = rng.choice([1, 2])
    D = rng.randint(1, 3)
    s1 = rng.randint(8, 13)
    s2 = rng.randint(s1 + 5, 24)
    r = rng.randint(1, max(1, s1 - W - D - 2))

    scratch, src_dir, ckpt = _stream_scratch(f"latedrop_{case_id}")
    events = load(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    stages = [
        events.filter(day <= s1),
        events.filter((day > s1) & (day <= s2)),
        events.filter(day <= r).unionByName(events.filter(day > s2)),
    ]
    _stage_ordered_files(scratch, src_dir, stages)

    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = (
        source.withWatermark("ts", f"{D} days")
        .groupBy(F.window("ts", f"{W} days").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "n_events")
    )
    name = f"fuzz_latedrop_{case_id}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, f"fuzz watermark stream {case_id}")
    got = {
        (row["window_start_s"], row["n_events"])
        for row in spark.table(name).collect()
    }

    win = 86400 * W
    sql = f"""
        WITH mx AS (SELECT MAX(ts) AS m FROM events)
        SELECT CAST(FLOOR(epoch(ts) / {win}) * {win} AS BIGINT) AS ws,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events, mx
        WHERE FLOOR(epoch(ts) / {win}) * {win} + {win}
              <= epoch(m) - {D} * 86400
        GROUP BY 1
    """
    want = set(map(tuple, duck.execute(sql).fetchall()))
    assert got == want, (case_id, W, D, s1, s2, r)


@pytest.mark.parametrize("case_id,rng", _cases()[:7])
def test_differential_random_dedupe_state_eviction(spark, sf_dir, duck,
                                                   case_id, rng):
    """Randomized dropDuplicatesWithinWatermark: random in-batch duplicate
    range [a, b] inside batch 0, random delay, splits and replay range.
    Expected survivor counts are exactly the original per-day counts -
    a failed dedup inflates [a, b], a failed lateness filter inflates
    days <= r."""
    from nyc_analytics_database_platform_spark.queries.streaming_stateful import (
        _stage_ordered_files,
        drain_or_raise,
    )

    D = rng.randint(1, 3)
    s1 = rng.randint(8, 13)
    s2 = rng.randint(s1 + 5, 24)
    r = rng.randint(1, max(1, s1 - D - 2))
    a = rng.randint(1, s1 - 2)
    b = rng.randint(a, s1)

    scratch, src_dir, ckpt = _stream_scratch(f"dedupe_{case_id}")
    events = load(spark, sf_dir, "events").select("event_id", "ts")
    day = F.dayofmonth("ts")
    stages = [
        events.filter(day <= s1).unionByName(
            events.filter((day >= a) & (day <= b))
        ),
        events.filter((day > s1) & (day <= s2)),
        events.filter(day <= r).unionByName(events.filter(day > s2)),
    ]
    _stage_ordered_files(scratch, src_dir, stages)

    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    deduped = source.withWatermark(
        "ts", f"{D} days"
    ).dropDuplicatesWithinWatermark(["event_id"])
    name = f"fuzz_dedupe_{case_id}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, f"fuzz dedupe stream {case_id}")
    got = {
        (row["day_s"], row["n"])
        for row in spark.table(name)
        .groupBy(F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }

    want = set(
        map(
            tuple,
            duck.execute(
                """
        SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
        """
            ).fetchall(),
        )
    )
    assert got == want, (case_id, D, s1, s2, r, a, b)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_scd2_apply(spark, sf_dir, duck, case_id, rng):
    """Incremental-maintenance fuzz (round 9): split the orders log at a
    RANDOM cutoff (including the degenerate empty-history / empty-delta
    extremes), build the SCD2 dimension from the history side only, fold
    the tail in via operators/maintenance.scd2_apply_changes, and compare
    against DuckDB's FULL recompute over the whole (filtered) log - the
    merge(derive(hist), delta) == derive(all) contract under random
    cutoffs, attribute sets, and log-thinning predicates."""
    from nyc_analytics_database_platform_spark.operators.maintenance import (
        scd2_apply_changes,
    )
    from nyc_analytics_database_platform_spark.operators.scd import (
        scd2_intervals,
    )

    attrs = rng.choice(
        [("o_orderstatus",), ("o_orderpriority",), ("o_orderstatus", "o_orderpriority")]
    )
    pmin = round(rng.uniform(0.0, 120_000.0), 2)
    lo, hi = duck.execute(
        f"SELECT min(o_orderdate), max(o_orderdate) FROM orders"
        f" WHERE o_totalprice >= {pmin}"
    ).fetchone()
    mode = rng.choice(["mid", "mid", "mid", "empty_hist", "empty_delta"])
    if mode == "empty_hist":
        cutoff = lo
    elif mode == "empty_delta":
        cutoff = hi + datetime.timedelta(days=1)
    else:
        cutoff = lo + (hi - lo) * rng.random()

    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= pmin)
    cut = F.lit(cutoff.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    hist_scd = scd2_intervals(
        orders.filter(F.col("o_orderdate") < cut),
        key_col="o_custkey", ts_col="o_orderdate",
        attr_cols=attrs, order_cols=("o_orderkey",),
    )
    merged = scd2_apply_changes(
        hist_scd, orders.filter(F.col("o_orderdate") >= cut),
        key_col="o_custkey", ts_col="o_orderdate",
        attr_cols=attrs, order_cols=("o_orderkey",),
    )
    sdf = merged.select(
        "o_custkey", *attrs,
        F.unix_micros("valid_from").alias("vf_us"),
        F.unix_micros("valid_to").alias("vt_us"),
        "version",
        F.col("is_current").cast("int").alias("is_current"),
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    attr_sel = ", ".join(attrs)
    change = " OR ".join(
        f"({a} IS DISTINCT FROM lag({a}) OVER w)" for a in attrs
    )
    sql = f"""
        WITH ordered AS (
            SELECT o_custkey, o_orderkey, {attr_sel}, o_orderdate,
                   (lag(o_orderkey) OVER w IS NULL) AS is_first,
                   {" , ".join(f"lag({a}) OVER w AS prev_{a}" for a in attrs)}
            FROM orders
            WHERE o_totalprice >= {pmin}
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ),
        ch AS (
            SELECT * FROM ordered
            WHERE is_first OR {" OR ".join(f"({a} IS DISTINCT FROM prev_{a})" for a in attrs)}
        ),
        iv AS (
            SELECT o_custkey, {attr_sel},
                   epoch_us(o_orderdate) AS vf_us,
                   epoch_us(lead(o_orderdate) OVER w2) AS vt_us,
                   CAST(ROW_NUMBER() OVER w2 AS INT) AS version
            FROM ch
            WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        )
        SELECT o_custkey, {attr_sel}, vf_us, vt_us, version,
               CAST(vt_us IS NULL AS INT) AS is_current
        FROM iv
    """
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, attrs, pmin, mode, cutoff)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_session_merge(spark, sf_dir, duck, case_id, rng):
    """Incremental session-table maintenance fuzz (round 9): random gap,
    random event-type subset, random cutoff (with empty-side extremes);
    sessionize each side separately, merge via operators/maintenance.
    merge_session_tables (additive count/cents partials + a SET partial
    for the distinct-type count), compare against DuckDB's one-pass
    sessionization of all surviving events. Pins the seam rule (merge iff
    boundary gap < gap, the same >= close convention as sessionize) and
    the seq renumbering."""
    from nyc_analytics_database_platform_spark.operators.maintenance import (
        merge_session_tables,
    )
    from nyc_analytics_database_platform_spark.operators.sessions import (
        sessionize,
    )

    types = ["click", "error", "purchase", "signup", "view"]
    et = rng.sample(types, k=rng.randint(2, 5))
    gap = rng.choice([60, 300, 900, 3600, 14400])
    lo, hi = duck.execute(
        "SELECT min(ts), max(ts) FROM events WHERE event_type IN ("
        + ", ".join(f"'{t}'" for t in et) + ")"
    ).fetchone()
    mode = rng.choice(["mid", "mid", "mid", "empty_hist", "empty_delta"])
    if mode == "empty_hist":
        cutoff = lo
    elif mode == "empty_delta":
        cutoff = hi + datetime.timedelta(seconds=1)
    else:
        cutoff = lo + (hi - lo) * rng.random()

    events = load(spark, sf_dir, "events").filter(F.col("event_type").isin(et))
    cut = F.lit(cutoff.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp")

    def side(df):
        s = sessionize(df, "user_id", "ts", gap, order_cols=("event_id",))
        return s.groupBy("user_id", "session_seq").agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
            F.collect_set("event_type").alias("type_set"),
        )

    merged = merge_session_tables(
        side(events.filter(F.col("ts") < cut)),
        side(events.filter(F.col("ts") >= cut)),
        key_col="user_id", gap_us=gap * 1_000_000,
        seq_col="session_seq", start_col="start_us", end_col="end_us",
        add_cols=("n_events", "sum_cents"), set_cols=("type_set",),
    )
    sdf = merged.select(
        "user_id", "session_seq", "start_us", "end_us", "n_events",
        "sum_cents", F.size("type_set").cast("bigint").alias("n_types"),
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    et_sql = ", ".join(f"'{t}'" for t in et)
    sql = f"""
        WITH e AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                   CAST(ROUND(value * 100) AS BIGINT) AS v_cents
            FROM events WHERE event_type IN ({et_sql})
        ),
        m AS (
            SELECT *,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w >= {gap * 1_000_000}
                        THEN 1 ELSE 0 END AS ns
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        s AS (
            SELECT *, SUM(ns) OVER (
                PARTITION BY user_id ORDER BY us, event_id
                ROWS UNBOUNDED PRECEDING
            ) AS session_seq
            FROM m
        )
        SELECT user_id, session_seq, MIN(us) AS start_us, MAX(us) AS end_us,
               COUNT(*) AS n_events, SUM(v_cents) AS sum_cents,
               COUNT(DISTINCT event_type) AS n_types
        FROM s GROUP BY user_id, session_seq
    """
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, et, gap, mode, cutoff)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_union_asof(spark, sf_dir, duck, case_id, rng):
    """Union-as-of fuzz (round 9): the window rewrite behind
    pit_external_facts_asof under random fact subsets, dimension
    attributes, and key columns - always compared against the textbook
    SCD2 interval join in DuckDB. Pins the seam convention (facts sort
    AFTER same-timestamp dimension events == vf <= t < vt)."""
    from pyspark.sql import Window

    attr = rng.choice(["o_orderstatus", "o_orderpriority"])
    fact_mod = rng.choice([3, 5, 7, 11])
    pmin = round(rng.uniform(0.0, 150_000.0), 2)

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % fact_mod == 0)
        & (F.col("l_extendedprice") >= pmin)
    )
    dim = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("src"),
        "o_orderkey",
        F.col(attr).alias("attr"),
        F.lit(None).cast("bigint").alias("l_orderkey"),
        F.lit(None).cast("int").alias("l_linenumber"),
    )
    facts = lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        F.col("o_custkey").alias("k"),
        F.col("l_shipdate").alias("ts"),
        F.lit(1).alias("src"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("string").alias("attr"),
        "l_orderkey",
        "l_linenumber",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = F.max(
        F.when(F.col("src") == 0, F.struct("ts", "o_orderkey", "attr"))
    ).over(w)
    sdf = (
        dim.unionByName(facts)
        .withColumn("_asof", asof)
        .filter((F.col("src") == 1) & F.col("_asof").isNotNull())
        .select(
            "l_orderkey",
            "l_linenumber",
            F.unix_micros("ts").alias("ship_us"),
            F.col("_asof.attr").alias("attr_asof"),
        )
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    sql = f"""
        WITH ordered AS (
            SELECT o_custkey, o_orderkey, {attr} AS attr, o_orderdate,
                   lag({attr}) OVER w AS prev_attr,
                   (lag(o_orderkey) OVER w IS NULL) AS is_first
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ),
        iv AS (
            SELECT o_custkey AS k, attr,
                   o_orderdate AS vf,
                   lead(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey) AS vt
            FROM ordered
            WHERE is_first OR attr IS DISTINCT FROM prev_attr
        ),
        f AS (
            SELECT l.l_orderkey, l.l_linenumber,
                   epoch_us(l.l_shipdate) AS ship_us, l.l_shipdate, o.o_custkey
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_orderkey % {fact_mod} = 0
              AND l.l_extendedprice >= {pmin}
        )
        SELECT f.l_orderkey, f.l_linenumber, f.ship_us, i.attr AS attr_asof
        FROM f JOIN iv i ON i.k = f.o_custkey
                        AND f.l_shipdate >= i.vf
                        AND (i.vt IS NULL OR f.l_shipdate < i.vt)
    """
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, attr, fact_mod, pmin)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_two_phase_quantile(spark, sf_dir, duck, case_id, rng):
    """Two-phase exact quantile fuzz (round 9): random predicate, random
    quantile fraction num/den, random bin count - phase 1 builds the
    histogram in-query (same arithmetic as the persisted table), phase 2
    refines inside the located bin; the answer must equal DuckDB's exact
    rank-selected order statistic."""
    from pyspark.sql import Window

    num, den = rng.choice([(1, 2), (1, 4), (3, 4), (9, 10), (19, 20), (99, 100)])
    n_bins = rng.choice([64, 256, 1024, 4096])
    status = rng.choice(["F", "O", "P"])

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == status
    )
    lo, hi = orders.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    if lo is None:
        pytest.skip("empty selection")
    width = ((hi - lo) / n_bins) or 1.0
    bin_expr = F.least(
        F.floor((F.col("o_totalprice") - F.lit(lo)) / F.lit(width)),
        F.lit(n_bins - 1),
    )
    histo = orders.groupBy(bin_expr.alias("bin")).agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = histo.withColumn("cum", F.sum("cnt").over(wcum))
    tot = cum.agg(F.max("cum").alias("n_tot"))
    loc = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn(
            "k",
            ((F.lit(num) * F.col("n_tot") + (den - 1)) / den).cast("long"),
        )
        .withColumn("prev", F.col("cum") - F.col("cnt"))
        .agg(
            F.min(F.when(F.col("cum") >= F.col("k"), F.col("bin"))).alias("b"),
            F.max(
                F.when(F.col("cum") >= F.col("k"), F.col("k") - F.col("prev"))
            ).alias("r"),
        )
        .first()
    )
    sliver = orders.filter(
        (F.col("o_totalprice") >= F.lit(lo + (loc["b"] - 1) * width))
        & (
            (F.col("o_totalprice") < F.lit(lo + (loc["b"] + 2) * width))
            | F.lit(bool(loc["b"] >= n_bins - 1))
        )
    ).filter(bin_expr == F.lit(loc["b"]))
    wbin = Window.orderBy("o_totalprice")
    got = (
        sliver.withColumn("_rn", F.row_number().over(wbin))
        .filter(F.col("_rn") == F.lit(int(loc["r"])))
        .select(F.col("o_totalprice").alias("q"))
        .first()
    )

    want = duck.execute(f"""
        WITH v AS (
            SELECT o_totalprice AS p,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn,
                   COUNT(*) OVER () AS n
            FROM orders WHERE o_orderstatus = '{status}'
        )
        SELECT MAX(CASE WHEN rn = ({num} * n + {den - 1}) // {den} THEN p END)
        FROM v
    """).fetchone()[0]
    assert got is not None and repr(got["q"]) == repr(want), (
        case_id, num, den, n_bins, status, got, want,
    )


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_mg_heavy_tokens(spark, sf_dir, duck, case_id, rng):
    """Heavy-hitter sketch-table fuzz (round 9): random source subset and
    random phi = 1/den with den <= the table's capacity-64 guarantee; the
    summary-merge + exact-verify answer must equal DuckDB's full GROUP
    BY/HAVING over the same tokenization. A truncation that broke the
    superset guarantee would drop a row here."""
    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        build_source_token_mg_table,
    )

    all_sources = [
        r[0]
        for r in duck.execute("SELECT DISTINCT source FROM documents ORDER BY 1")
        .fetchall()
    ]
    sources = rng.sample(all_sources, k=rng.randint(2, min(12, len(all_sources))))
    den = rng.choice([20, 25, 32, 40, 50, 64])

    path = build_source_token_mg_table(spark, sf_dir)
    tab = spark.read.parquet(path).filter(F.col("source").isin(sources))
    cands = tab.select("token").distinct()
    n_range = (
        tab.select("source", "n_tokens")
        .distinct()
        .agg(F.sum("n_tokens").alias("n_tot"))
    )
    docs = load(spark, sf_dir, "documents").filter(F.col("source").isin(sources))
    sdf = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
        )
        .join(F.broadcast(cands), on="token", how="left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .crossJoin(F.broadcast(n_range))
        .filter(F.col("n_occurrences") * den > F.col("n_tot"))
        .select("token", "n_occurrences")
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    src_sql = ", ".join(f"'{s}'" for s in sources)
    sql = rf"""
        WITH toks AS (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
            FROM documents WHERE source IN ({src_sql})
        ),
        tot AS (SELECT COUNT(*) AS n FROM toks)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM toks GROUP BY token
        HAVING COUNT(*) * {den} > (SELECT n FROM tot)
    """
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, sources, den)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_manifest_pruning(spark, sf_dir, duck, case_id, rng):
    """Manifest-pruning fuzz (round 9): random date windows (including
    before-all-data and degenerate empty windows) planned from the
    persisted per-file manifest; the pruned multi-file scan must
    reproduce DuckDB's answer over the unfragmented source exactly."""
    import datetime as _dt
    import os as _os

    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        build_orders_date_manifest,
    )

    lo, hi = duck.execute(
        "SELECT min(o_orderdate), max(o_orderdate) FROM orders"
    ).fetchone()
    span = (hi - lo).days
    a = lo + _dt.timedelta(days=rng.randint(-30, span))
    b = a + _dt.timedelta(days=rng.choice([0, 7, 30, 90, 365]))
    a_s, b_s = a.strftime("%Y-%m-%d %H:%M:%S"), b.strftime("%Y-%m-%d %H:%M:%S")

    layout, manifest = build_orders_date_manifest(spark, sf_dir)
    picked = (
        spark.read.parquet(manifest)
        .filter(
            (F.col("max_ts") >= F.lit(a_s).cast("timestamp"))
            & (F.col("min_ts") < F.lit(b_s).cast("timestamp"))
        )
        .select("file")
        .collect()
    )
    paths = [_os.path.join(layout, r["file"]) for r in picked]
    if paths:
        pruned = spark.read.parquet(*paths)
    else:
        pruned = load(spark, sf_dir, "orders").limit(0)
    sdf = (
        pruned.filter(
            (F.col("o_orderdate") >= F.lit(a_s).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(b_s).cast("timestamp"))
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    cols = sorted(sdf.columns)
    got = Counter(tuple(_canon(r_[c]) for c in cols) for r_ in sdf.collect())

    cur = duck.execute(f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{a_s}'
          AND o_orderdate <  TIMESTAMP '{b_s}'
        GROUP BY o_orderstatus
    """)
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in sorted(ocols)]
    want = Counter(tuple(_canon(row[i]) for i in idx) for row in cur.fetchall())

    assert sorted(ocols) == cols, (case_id, cols, ocols)
    assert got == want, (case_id, a_s, b_s, len(paths))


# ---------------------------------------------------------------------------
# STREAMING MAINTENANCE state-machine fuzz (round 10, VERDICT r9 #7): the
# executed SCD2/session maintenance streams had fixed 4-file splits; these
# families randomize the trigger split points AND the key population per
# case, so micro-batch boundaries land mid-run / mid-session for some keys
# and versions/seqs must still continue exactly as the batch recompute says.


@pytest.mark.parametrize("case_id,rng", _cases()[:8])
def test_differential_random_stream_scd2_maintenance(spark, sf_dir, duck,
                                                     case_id, rng):
    """Random micro-batch cuts (2-4 random dates -> 3-5 chronological
    files) and a random custkey congruence class drain through the
    streaming SCD2 state machine; the emitted CLOSED intervals must equal
    the batch recompute's, versions continuing across every batch
    boundary. The straddle assert proves at least one key's run actually
    spans a cut (the seam the fuzz exists to stress)."""
    from nyc_analytics_database_platform_spark.queries.streaming_stateful import (
        _stage_ordered_files,
        drain_or_raise,
    )
    from nyc_analytics_database_platform_spark.streaming.stateful import (
        scd2_closed_intervals,
    )

    m = rng.choice([2, 3, 5])
    rem = rng.randrange(m)
    n_cuts = rng.randint(2, 4)
    days = sorted(rng.sample(range(200, 2300), n_cuts))  # 1995-07..2001-06
    cuts = [
        f"CAST(TIMESTAMP '1995-01-01' + INTERVAL {d} DAY AS TIMESTAMP)"
        for d in days
    ]
    where = f"o_custkey % {m} = {rem}"

    # the seam stress must actually occur: some key's batch-boundary run
    # straddles at least one cut (runs are months long, so this holds for
    # every seed - the assert documents the property, not luck)
    straddle = duck.execute(f"""
        WITH ordered AS (
            SELECT o_custkey, o_orderstatus, o_orderdate,
                   lag(o_orderstatus) OVER w AS prev_status
            FROM orders WHERE {where}
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ),
        iv AS (
            SELECT o_custkey, o_orderdate AS vf,
                   lead(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate) AS vt
            FROM ordered
            WHERE prev_status IS NULL OR o_orderstatus <> prev_status
        )
        SELECT COUNT(*) FROM iv
        WHERE vt IS NOT NULL AND ({" OR ".join(
            f"(vf < {c} AND vt > {c})" for c in cuts
        )})
    """).fetchone()[0]
    assert straddle > 0, (case_id, days)

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % m == rem
    ).select(
        "o_custkey",
        F.unix_micros("o_orderdate").alias("ts_us"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
    )
    base = F.unix_micros(F.lit("1995-01-01").cast("timestamp"))
    cuts_us = [base + d * 86_400_000_000 for d in days]
    bounds = [None, *cuts_us, None]
    stages = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        st = orders
        if lo is not None:
            st = st.filter(F.col("ts_us") >= lo)
        if hi is not None:
            st = st.filter(F.col("ts_us") < hi)
        stages.append(st)

    scratch, src_dir, ckpt = _stream_scratch(f"scd2m_{case_id}")
    _stage_ordered_files(scratch, src_dir, stages)
    source = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    name = f"fuzz_scd2m_{case_id}"
    q = (
        scd2_closed_intervals(source)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, f"fuzz scd2 maintenance stream {case_id}")
    got = Counter(
        tuple(row) for row in spark.table(name)
        .select("custkey", "status", "vf_us", "vt_us", "version")
        .collect()
    )
    want = Counter(map(tuple, duck.execute(f"""
        WITH ordered AS (
            SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
                   lag(o_orderstatus) OVER w AS prev_status
            FROM orders WHERE {where}
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ),
        ch AS (
            SELECT * FROM ordered
            WHERE prev_status IS NULL OR o_orderstatus <> prev_status
        ),
        iv AS (
            SELECT o_custkey AS custkey, o_orderstatus AS status,
                   epoch_us(o_orderdate) AS vf_us,
                   epoch_us(lead(o_orderdate) OVER w2) AS vt_us,
                   CAST(ROW_NUMBER() OVER w2 AS INT) AS version
            FROM ch
            WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        )
        SELECT custkey, status, vf_us, vt_us, version
        FROM iv WHERE vt_us IS NOT NULL
    """).fetchall()))
    assert got == want, (case_id, m, rem, days)


@pytest.mark.parametrize("case_id,rng", _cases()[:8])
def test_differential_random_stream_session_maintenance(spark, sf_dir, duck,
                                                        case_id, rng):
    """Random micro-batch cuts at SECOND granularity (so boundaries land
    inside live 5-minute sessions for some users) and a random user_id
    congruence class drain through the streaming session state machine;
    emitted CLOSED sessions must equal batch sessionization minus each
    user's still-open last session, seq numbering continuing across every
    boundary."""
    from nyc_analytics_database_platform_spark.queries.streaming_stateful import (
        _stage_ordered_files,
        drain_or_raise,
    )
    from nyc_analytics_database_platform_spark.streaming.stateful import (
        session_closed_windows,
    )

    m = rng.choice([2, 3, 4])
    rem = rng.randrange(m)
    n_cuts = rng.randint(2, 4)
    # seconds into January 2024, day 2 .. day 29
    secs = sorted(rng.sample(range(86_400, 28 * 86_400), n_cuts))
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
    cuts_us = [base_us + s * 1_000_000 for s in secs]

    events = load(spark, sf_dir, "events").filter(
        F.col("user_id") % m == rem
    ).select("user_id", F.unix_micros("ts").alias("ts_us"), "event_id")
    bounds = [None, *cuts_us, None]
    stages = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        st = events
        if lo is not None:
            st = st.filter(F.col("ts_us") >= lo)
        if hi is not None:
            st = st.filter(F.col("ts_us") < hi)
        stages.append(st)

    scratch, src_dir, ckpt = _stream_scratch(f"sessm_{case_id}")
    _stage_ordered_files(scratch, src_dir, stages)
    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    name = f"fuzz_sessm_{case_id}"
    q = (
        session_closed_windows(source)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, f"fuzz session maintenance stream {case_id}")
    got = Counter(
        tuple(row) for row in spark.table(name)
        .select("user_id", "session_seq", "start_us", "end_us", "n_events")
        .collect()
    )
    want = Counter(map(tuple, duck.execute(f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS us FROM events
            WHERE user_id % {m} = {rem}
        ),
        mk AS (
            SELECT *,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w >= 300000000
                        THEN 1 ELSE 0 END AS ns
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        s AS (
            SELECT *, SUM(ns) OVER (
                PARTITION BY user_id ORDER BY us, event_id
                ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM mk
        ),
        agg AS (
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   MIN(us) AS start_us, MAX(us) AS end_us,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, session_seq
        ),
        lastmark AS (
            SELECT *, MAX(session_seq) OVER (PARTITION BY user_id) AS mx
            FROM agg
        )
        SELECT user_id, session_seq, start_us, end_us, n_events
        FROM lastmark WHERE session_seq < mx
    """).fetchall()))
    assert got == want, (case_id, m, rem, secs)


@pytest.mark.parametrize("case_id,rng", _cases()[:15])
def test_differential_random_txnlog_chain(spark, tmp_path, case_id, rng):
    """Transaction-log fuzz (round 10): a random commit chain (appends,
    copy-on-write range deletes, merge-on-read deletes, purges,
    exactly-once stream batches) is tracked against an exact dict model.
    Every version's time-travel read must equal the model state at that
    version, and a random changes_between pair must equal the model's set
    difference — across arbitrary interleavings of CoW and MoR, which is
    precisely where delete-set carry-forward bugs hide (this family caught
    appends dropping the parent's delete_files before release)."""
    from nyc_analytics_database_platform_spark.operators import txnlog

    root = str(tmp_path / "t")
    state: dict[int, float] = {}
    model_states: dict[int, dict[int, float]] = {}
    next_key, batch_seq, mor_live = 0, 0, False

    def mkdf(rows):
        return spark.createDataFrame(rows, "k long, v double")

    for _ in range(rng.randint(3, 6)):
        choices = ["append", "stream"]
        if state:
            choices += ["cow", "mor", "streamdel", "optimize", "rewrite"]
        if mor_live:
            choices.append("purge")
        op = rng.choice(choices)
        if op in ("append", "stream"):
            n = rng.randint(5, 40)
            rows = [(next_key + i, float(rng.randint(0, 9))) for i in range(n)]
            next_key += n + rng.randint(0, 10)
            if op == "append":
                txnlog.append(spark, root, mkdf(rows), range_col="k",
                              n_files=rng.randint(1, 3))
            else:
                assert txnlog.commit_stream_batch(
                    spark, root, mkdf(rows), batch_id=batch_seq,
                    range_col="k") is not None
                batch_seq += 1
            state.update({k: v for k, v in rows})
        elif op in ("cow", "mor", "streamdel"):
            lo = rng.randint(0, next_key)
            hi = lo + rng.randint(1, max(2, next_key // 2))
            survivors = {k: v for k, v in state.items() if not lo <= k < hi}
            if not survivors:
                continue  # keep the table non-empty (see _write_version_dir)
            if op == "cow":
                txnlog.delete_range_cow(spark, root, "k", lo, hi)
            elif op == "mor":
                txnlog.delete_where_mor(
                    spark, root, ["k"],
                    (F.col("k") >= lo) & (F.col("k") < hi))
                mor_live = True
            else:
                # round 11: streaming equality-delete commit — exactly-once
                # per batch_id; immediate redelivery must be a no-op.
                keys = mkdf([(k, 0.0) for k in state if lo <= k < hi]
                            or [(-1, 0.0)]).select("k")
                assert txnlog.commit_stream_delete_batch(
                    spark, root, keys, batch_id=batch_seq,
                    key_cols=["k"]) is not None
                assert txnlog.commit_stream_delete_batch(
                    spark, root, keys, batch_id=batch_seq,
                    key_cols=["k"]) is None
                batch_seq += 1
                mor_live = True
            state = survivors
        elif op == "optimize":
            txnlog.optimize(spark, root, F.col("k"), "k",
                            n_files=rng.randint(1, 3))
            mor_live = False  # optimize materializes and drops the DV
        elif op == "rewrite":
            # Round 13: the re-encode commit — a content-changing full
            # rewrite (even keys bumped) whose CDC must be exactly the
            # value diff; any pending MoR delete set is ENFORCED by the
            # rewrite (anti-join) and then dropped.
            bump = rng.randint(1, 5)
            new = txnlog.read_version(spark, root).withColumn(
                "v", F.when(F.col("k") % 2 == 0,
                            F.col("v") + float(bump)).otherwise(F.col("v")))
            txnlog.rewrite(spark, root, new, "optimize:reencode",
                           range_col="k", n_files=rng.randint(1, 3))
            state = {k: (v + bump if k % 2 == 0 else v)
                     for k, v in state.items()}
            mor_live = False  # rewrite applies and drops the DV
        else:  # purge
            txnlog.purge_deletes(spark, root, "k")
            mor_live = False
        model_states[txnlog.latest_version(root)] = dict(state)

    # Mid-chain zero-copy clone: fork at a random committed version, let
    # the source keep evolving (it already has), and the clone must still
    # read the model state AS OF the fork - even after the source vacuums.
    fork = rng.choice(sorted(model_states))
    clone_root = str(tmp_path / "clone")
    txnlog.clone(root, clone_root, version=fork)
    # Branch pin at a random version: vacuum with retention 1 must keep it.
    pin = rng.choice(sorted(model_states))
    txnlog.set_branch(root, "pinned", pin)
    txnlog.vacuum(root, keep_last=1)
    got_clone = {(r["k"], r["v"])
                 for r in txnlog.read_version(spark, clone_root).collect()}
    assert got_clone == set(model_states[fork].items()), (case_id, fork)
    got_pin = {(r["k"], r["v"])
               for r in txnlog.read_branch(spark, root, "pinned").collect()}
    assert got_pin == set(model_states[pin].items()), (case_id, pin)

    for v, want in model_states.items():
        if v != txnlog.latest_version(root) and v != pin:
            continue  # other versions may be vacuumed; head + pin survive
        got = {(r["k"], r["v"])
               for r in txnlog.read_version(spark, root, v).collect()}
        assert got == set(want.items()), (case_id, v)

    head = txnlog.latest_version(root)
    if pin < head:
        feed = txnlog.changes_between(spark, root, pin, head,
                                      ["k", "v"]).collect()
        sa = set(model_states[pin].items())
        sb = set(model_states[head].items())
        ins = {(r["k"], r["v"]) for r in feed if r["change_type"] == "insert"}
        dels = {(r["k"], r["v"]) for r in feed if r["change_type"] == "delete"}
        assert ins == sb - sa, (case_id, pin, head)
        assert dels == sa - sb, (case_id, pin, head)


@pytest.mark.parametrize("case_id,rng", _cases()[:4])
def test_differential_random_cdc_dedup_maintenance(
    spark, sf_dir, tmp_path, case_id, rng
):
    """CDC-driven dedup maintenance fuzz (round 11): a random documents
    commit chain (appends of unseen doc batches, copy-on-write doc_id
    range deletions) advances the persisted dedup state — LSH band index
    + component assignment — one change-feed version at a time through
    maintain_clusters_from_feed. After the walk, the incrementally
    maintained assignment must equal the from-scratch connected
    components over the LIVE corpus exactly (labels included) — the
    equivalence dedup_maintain_from_cdf attests on one fixed chain,
    here across arbitrary insert/delete interleavings where retraction
    bugs (stale edges, resurrected members, unsplit components) hide."""
    from nyc_analytics_database_platform_spark.operators import txnlog
    from nyc_analytics_database_platform_spark.operators.dedup import (
        banded_buckets,
        minhash_signatures,
    )
    from nyc_analytics_database_platform_spark.operators.graph import (
        connected_components,
    )
    from nyc_analytics_database_platform_spark.queries.llm_clusters import (
        _band_pairs,
        maintain_clusters_from_feed,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "docs")
    cols = ["doc_id", "text"]

    def bands_of(df):
        return banded_buckets(minhash_signatures(df, num_perm=12, k=5),
                              num_perm=12, rows_per_band=2)

    # v1: a random prefix of the corpus (planted near-dups included).
    cut0 = rng.randint(100, 350)
    live = set(range(cut0))
    txnlog.append(spark, root, docs.filter(F.col("doc_id") < cut0),
                  range_col="doc_id", n_files=3)
    state_b = bands_of(docs.filter(F.col("doc_id") < cut0))
    state_a = connected_components(_band_pairs(state_b))
    next_id = cut0
    for _ in range(rng.randint(2, 4)):
        prev = txnlog.latest_version(root)
        if next_id < 500 and (not live or rng.random() < 0.6):
            hi = min(500, next_id + rng.randint(20, 120))
            txnlog.append(
                spark, root,
                docs.filter((F.col("doc_id") >= next_id)
                            & (F.col("doc_id") < hi)),
                range_col="doc_id", n_files=2)
            live |= set(range(next_id, hi))
            next_id = hi
        else:
            lo = rng.randint(0, next_id)
            hi = lo + rng.randint(10, max(20, next_id // 3))
            survivors = {d for d in live if not lo <= d < hi}
            if not survivors:
                continue  # table must stay non-empty
            txnlog.delete_range_cow(spark, root, "doc_id", lo, hi)
            live = survivors
        feed = txnlog.changes_between(
            spark, root, prev, txnlog.latest_version(root), cols)
        state_b, state_a = maintain_clusters_from_feed(
            spark, state_b, state_a, feed)
        # The production state is a PERSISTED table between advances;
        # checkpointing models that and keeps each step's plan bounded
        # (chained lazy feeds made the walk quadratic in steps).
        state_b = state_b.localCheckpoint()
        state_a = state_a.localCheckpoint()
    got = {(r["node"], r["component"]) for r in state_a.collect()}
    live_docs = docs.filter(
        F.col("doc_id").isin([int(d) for d in live]))
    want = {
        (r["node"], r["component"])
        for r in connected_components(_band_pairs(bands_of(live_docs)))
        .collect()
    }
    assert got == want, (case_id, cut0, len(live))


@pytest.mark.parametrize("case_id,rng", _cases()[:3])
def test_differential_random_cdc_ann_maintenance(
    spark, sf_dir, tmp_path, case_id, rng
):
    """CDC-driven ANN index maintenance fuzz (round 12): a random
    embeddings commit chain (appends of unseen vec_id batches,
    copy-on-write range deletions) advances the IVF cell lists one
    change-feed version at a time through maintain_cells_from_feed,
    against a quantizer frozen on the initial prefix. After the walk the
    incrementally maintained lists must equal a from-scratch assignment
    of the live vectors under the SAME frozen quantizer — the
    equivalence ann_maintain_from_cdf attests on one fixed chain, here
    across arbitrary insert/delete interleavings."""
    from nyc_analytics_database_platform_spark.operators import txnlog
    from nyc_analytics_database_platform_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from nyc_analytics_database_platform_spark.queries.llm_ivf import (
        maintain_cells_from_feed,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    root = str(tmp_path / "emb")
    cols = ["vec_id", "embedding"]

    def vecs(df):
        return df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v"))

    cut0 = rng.randint(100, 350)
    live = set(range(cut0))
    txnlog.append(spark, root, emb.filter(F.col("vec_id") < cut0),
                  range_col="vec_id", n_files=3)
    cents, state = kmeans_fit(vecs(emb.filter(F.col("vec_id") < cut0)), 4, 2)
    cents = cents.localCheckpoint(eager=True)
    next_id = cut0
    for _ in range(rng.randint(2, 4)):
        prev = txnlog.latest_version(root)
        if next_id < 500 and (not live or rng.random() < 0.6):
            hi = min(500, next_id + rng.randint(20, 120))
            txnlog.append(
                spark, root,
                emb.filter((F.col("vec_id") >= next_id)
                           & (F.col("vec_id") < hi)),
                range_col="vec_id", n_files=2)
            live |= set(range(next_id, hi))
            next_id = hi
        else:
            lo = rng.randint(0, next_id)
            hi = lo + rng.randint(10, max(20, next_id // 3))
            survivors = {d for d in live if not lo <= d < hi}
            if not survivors:
                continue  # table must stay non-empty
            txnlog.delete_range_cow(spark, root, "vec_id", lo, hi)
            live = survivors
        feed = txnlog.changes_between(
            spark, root, prev, txnlog.latest_version(root), cols)
        state = maintain_cells_from_feed(state, cents, feed)
        state = state.localCheckpoint()  # the persisted index between advances
    got = {(r["vec_id"], r["c_id"]) for r in state.collect()}
    live_vecs = vecs(emb.filter(F.col("vec_id").isin([int(d) for d in live])))
    want = {(r["vec_id"], r["c_id"])
            for r in assign_clusters(live_vecs, cents).collect()}
    assert got == want, (case_id, cut0, len(live))


@pytest.mark.parametrize("case_id,rng", _cases()[:3])
def test_differential_random_cdc_multi_index_maintenance(
    spark, sf_dir, tmp_path, case_id, rng
):
    """Multi-index curation maintenance fuzz (round 13, VERDICT r12 #1):
    a PAIRED documents+embeddings commit chain — the same random
    insert/delete interleaving applied to both tables, ids shared — is
    advanced one change-feed version at a time through ALL THREE
    maintenance steps (dedup clusters, IVF cells, PQ codes) in one loop,
    the shape curation_multi_index_advance registers on a fixed chain.
    After the walk: each state must equal its from-scratch recompute over
    the live corpus under the frozen quantizer/codebooks, AND the indexes
    must agree cross-wise — cells and codes cover exactly the live ids
    (an orphan is a leaked takedown, a hole is silent data loss) and
    every clustered node is live."""
    from nyc_analytics_database_platform_spark.operators import txnlog
    from nyc_analytics_database_platform_spark.operators.dedup import (
        banded_buckets,
        minhash_signatures,
    )
    from nyc_analytics_database_platform_spark.operators.graph import (
        connected_components,
    )
    from nyc_analytics_database_platform_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from nyc_analytics_database_platform_spark.operators.pq import pq_fit
    from nyc_analytics_database_platform_spark.queries.llm_clusters import (
        _band_pairs,
        maintain_clusters_from_feed,
    )
    from nyc_analytics_database_platform_spark.queries.llm_ivf import (
        maintain_cells_from_feed,
    )
    from nyc_analytics_database_platform_spark.queries.llm_pq import (
        encode_code_strings,
        maintain_codes_from_feed,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doc_root = str(tmp_path / "docs")
    emb_root = str(tmp_path / "emb")

    def bands_of(df):
        return banded_buckets(minhash_signatures(df, num_perm=12, k=5),
                              num_perm=12, rows_per_band=2)

    def vecs(df):
        return df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v"))

    cut0 = rng.randint(100, 350)
    live = set(range(cut0))
    txnlog.append(spark, doc_root, docs.filter(F.col("doc_id") < cut0),
                  range_col="doc_id", n_files=3)
    txnlog.append(spark, emb_root, emb.filter(F.col("vec_id") < cut0),
                  range_col="vec_id", n_files=3)
    band = bands_of(docs.filter(F.col("doc_id") < cut0))
    assign = connected_components(_band_pairs(band))
    emb1 = vecs(emb.filter(F.col("vec_id") < cut0))
    cents, cells = kmeans_fit(emb1, 4, 2)
    cents = cents.localCheckpoint(eager=True)
    books, _ = pq_fit(emb1, 4, 8, 2)
    books = books.localCheckpoint(eager=True)
    codes = encode_code_strings(emb1, books)
    next_id = cut0
    for _ in range(rng.randint(2, 4)):
        dprev = txnlog.latest_version(doc_root)
        eprev = txnlog.latest_version(emb_root)
        if next_id < 500 and (not live or rng.random() < 0.6):
            hi = min(500, next_id + rng.randint(20, 120))
            txnlog.append(
                spark, doc_root,
                docs.filter((F.col("doc_id") >= next_id)
                            & (F.col("doc_id") < hi)),
                range_col="doc_id", n_files=2)
            txnlog.append(
                spark, emb_root,
                emb.filter((F.col("vec_id") >= next_id)
                           & (F.col("vec_id") < hi)),
                range_col="vec_id", n_files=2)
            live |= set(range(next_id, hi))
            next_id = hi
        else:
            lo = rng.randint(0, next_id)
            hi = lo + rng.randint(10, max(20, next_id // 3))
            survivors = {d for d in live if not lo <= d < hi}
            if not survivors:
                continue  # table must stay non-empty
            txnlog.delete_range_cow(spark, doc_root, "doc_id", lo, hi)
            txnlog.delete_range_cow(spark, emb_root, "vec_id", lo, hi)
            live = survivors
        dfeed = txnlog.changes_between(
            spark, doc_root, dprev, txnlog.latest_version(doc_root),
            ["doc_id", "text"])
        efeed = txnlog.changes_between(
            spark, emb_root, eprev, txnlog.latest_version(emb_root),
            ["vec_id", "embedding"])
        band, assign = maintain_clusters_from_feed(spark, band, assign,
                                                   dfeed)
        cells = maintain_cells_from_feed(cells, cents, efeed) \
            .localCheckpoint()
        codes = maintain_codes_from_feed(codes, books, efeed) \
            .localCheckpoint()
    live_ids = [int(d) for d in live]
    # Per-index equivalence with the from-scratch recompute.
    got_assign = {(r["node"], r["component"]) for r in assign.collect()}
    want_assign = {
        (r["node"], r["component"])
        for r in connected_components(_band_pairs(bands_of(
            docs.filter(F.col("doc_id").isin(live_ids))))).collect()
    }
    assert got_assign == want_assign, (case_id, cut0, len(live))
    live_vecs = vecs(emb.filter(F.col("vec_id").isin(live_ids)))
    got_cells = {(r["vec_id"], r["c_id"]) for r in cells.collect()}
    want_cells = {(r["vec_id"], r["c_id"])
                  for r in assign_clusters(live_vecs, cents).collect()}
    assert got_cells == want_cells, (case_id, cut0, len(live))
    got_codes = {(r["vec_id"], r["codes"]) for r in codes.collect()}
    want_codes = {(r["vec_id"], r["codes"])
                  for r in encode_code_strings(live_vecs, books).collect()}
    assert got_codes == want_codes, (case_id, cut0, len(live))
    # Cross-index consistency: every index covers exactly the live ids
    # (no leaked takedown, no lost survivor); every clustered node lives.
    assert {v for v, _ in got_cells} == live
    assert {v for v, _ in got_codes} == live
    assert {n for n, _ in got_assign} <= live
