"""Distributed ordered prefix sum (two-level bucketed cumsum).

A running total over a GLOBAL order is the textbook window
`SUM(...) OVER (ORDER BY k)` - which Spark executes in ONE partition (the
WindowExec warns about it): correct on a bounded series, a scale-killer on a
corpus. This operator computes the same result with bounded parallelism, the
classic two-pass scan algorithm:

1. bucket every row by a PREFIX of the (orderable) key - prefix buckets are
   order-consistent: every key in bucket b sorts before every key in b+1;
2. per-bucket totals (one small aggregate) come to the driver - bucket
   count is fixed (e.g. 256), so this is index metadata, not data;
3. exclusive prefix offsets per bucket broadcast-join back, and the
   within-bucket window (partitionBy bucket - parallel!) adds its local
   running sum to the bucket offset.

Total cost: one aggregate + one windowed pass, both partitioned; no
single-partition stage anywhere. The same shape serves token-budget
sampling, exact-quantile assignment, and deterministic data splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_running_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "running_total",
    prefix_len: int = 2,
) -> DataFrame:
    """Add `out_col` = inclusive running sum of `value_col` in the global
    ascending order of the string key `key_col`. Keys must be
    lexicographically orderable (the callers use md5 hex digests, the
    repo's cross-engine ordering convention); the bucket is the key's first
    `prefix_len` characters, giving 16^prefix_len buckets."""
    bucket = F.substring(key_col, 1, prefix_len).alias("_bucket")
    rows = df.withColumn("_bucket", bucket)

    # coalesce: a bucket whose values are all NULL sums to NULL; treat it
    # as contributing 0 to downstream offsets instead of crashing int(None).
    totals = (
        rows.groupBy("_bucket")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("_bucket_total"))
        .collect()
    )
    offset_of: dict[str, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["_bucket"]):
        offset_of[r["_bucket"]] = acc
        acc += int(r["_bucket_total"])
    offsets = df.sparkSession.createDataFrame(
        [(b, o) for b, o in offset_of.items()], "_bucket string, _offset long"
    )

    w = (
        Window.partitionBy("_bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rows.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            out_col, F.col("_offset") + F.sum(value_col).over(w)
        )
        .drop("_bucket", "_offset")
    )


def ranked_by_range(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rk",
    num_shards: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global ROW_NUMBER over a TOTAL order without a
    single-partition window — the sharded rank scan `bucketed_running_sum`
    documents, generalized from string-prefix buckets to range partitions
    so any orderable key works (no lexicographic encoding, no skew from
    shared prefixes):

    1. `repartitionByRange` on the order columns — contiguous, ordered
       shards (the range sampler balances them);
    2. per-shard row counts to the driver (one row per shard — bounded
       index metadata, like the graph convergence probes);
    3. exclusive shard offsets broadcast back; within-shard ROW_NUMBER
       (partitionBy shard id — parallel) plus the offset is the global
       rank.

    `order_cols` must be a TOTAL order (include a unique tiebreaker) —
    equal keys may straddle a range boundary, and only a total order makes
    the straddling rank-exact. Returns (frame + out_col, total row count)
    — the count is free from the shard totals, so NTILE-style consumers
    need no second pass.

    Plan note: the within-shard window adds one balanced hash exchange on
    `_shard` (Catalyst cannot consume the checkpointed range layout as a
    distribution guarantee), so the frame moves twice — still strictly
    better than the single-partition global sort this replaces; callers
    feed either a pre-aggregated key frame (|customers|, |vocab|) or a
    column-pruned projection of the fact (ntile_decile: 2 columns)."""
    spark = df.sparkSession
    shards = num_shards or spark.sparkContext.defaultParallelism
    # localCheckpoint PINS the shard layout: the counts job and the window
    # job must see the IDENTICAL partitioning, but a re-executed range
    # exchange need not reproduce it (AQE coalesces adjacent range
    # partitions per-job from that job's runtime stats, and the range
    # sampler is per-execution) - without the pin the broadcast offsets
    # can misalign with the window's shard ids and ranks silently skew
    # (caught by the ntile_decile_price_bounds oracle at sf0.01).
    parts = (
        df.repartitionByRange(shards, *order_cols)
        .withColumn("_shard", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = sorted(
        (r["_shard"], r["cnt"])
        for r in parts.groupBy("_shard").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = spark.createDataFrame(offsets or [(0, 0)], "_shard int, _offset long")
    w = Window.partitionBy("_shard").orderBy(*order_cols)
    out = (
        parts.join(F.broadcast(off), "_shard")
        .withColumn(out_col, F.row_number().over(w) + F.col("_offset"))
        .drop("_shard", "_offset")
    )
    return out, acc


def exact_ntiles(
    df: DataFrame,
    specs: list,
    tiles: int = 5,
    num_shards: int | None = None,
    sample_per_shard: int = 60,
    seed: int = 17,
) -> tuple[DataFrame, int]:
    """Exact NTILE(tiles) for SEVERAL total orders over the SAME frame with
    NO global window anywhere - the multi-metric two-phase-quantile form of
    the sharded rank scan (VERDICT r9 #1: RFM\'s three back-to-back
    ranked_by_range passes paid ~9 jobs AND three full-frame
    exchange+sort+window passes; this pays 4 bounded jobs plus slivers).

    `specs`: list of (out_col, [(col, descending), ...]) where each order
    list is a TOTAL order (unique tiebreaker last) over NON-NULL columns.

    NTILE needs each row\'s TILE, not its rank - and a tile assignment only
    needs the tiles-1 exact BOUNDARY ROWS per metric (the row at global
    rank k for each cumulative tile size k). Those are order statistics,
    found two-phase like the lifecycle family\'s exact quantiles:

    1. ONE count + ONE uniform sample of the union of order columns (two
       bounded jobs); per metric, shard-boundary TUPLES at even sample
       positions define an order-consistent shard id as a binary-search
       when-tree (log2(shards) tuple comparisons per row - same per-row
       cost as the range partitioner);
    2. ONE aggregate groups by the JOINT shard vector (map-side combined,
       output bounded by distinct shard combos); every metric\'s per-shard
       margin folds out of it in the driver, placing each boundary rank k
       inside one (shard, local offset) - index arithmetic, no data moves.
       The shard-staged frame localCheckpoints under this job so later
       passes read shard ids instead of re-evaluating the trees;
    3. per metric, ONE sliver pass sorts ONLY the <= tiles-1 shards that
       contain boundary ranks (filter pushes into the block scan) and
       collects the tiles-1 boundary tuples - rows never leave their
       shard, and the sliver is ~(tiles-1)/shards of the frame;
    4. tile assignment is a binary-search when-tree over the tiles-1
       boundary tuples: 1 + count(boundaries b < row). No exchange, no
       sort - the assignment rides whatever scan consumes the frame next.

    At 100 TB this removes every O(n log n) step: two aggregate passes,
    sliver sorts bounded by n/shards, and a per-row log2(tiles) expression.
    Exactness: the orders are total, so the boundary row at rank k is
    unique and `row <= b_q` reproduces NTILE\'s first-(n mod t)-groups-get-
    ceil split bit-for-bit (pinned against window NTILE by the registered
    oracles and tests/test_round7_ops.py).

    Returns (frame + one int tile column per spec, total row count)."""
    spark = df.sparkSession
    shards = num_shards or spark.sparkContext.defaultParallelism
    all_cols = sorted({c for _, order in specs for c, _ in order})
    rows = df.localCheckpoint(eager=False)
    n = rows.count()
    target = shards * sample_per_shard
    frac = 1.0 if n <= target else min(1.0, (2.0 * target) / n)
    sample = [
        tuple(r) for r in rows.select(*all_cols).sample(frac, seed).collect()
    ]
    col_idx = {c: i for i, c in enumerate(all_cols)}

    def _key(order):
        # Python sort key matching (col, desc) tuple order; metrics are
        # numeric and non-null per the contract.
        def k(row):
            return tuple(
                (-row[col_idx[c]] if d else row[col_idx[c]]) for c, d in order
            )

        return k

    def _cmp_boundary(order, b, strict: bool) -> F.Column:
        # row >= boundary (strict=False) or row > boundary (strict=True)
        # in the spec\'s order, built innermost-first.
        expr = F.lit(not strict)
        for (c, d), bv in zip(reversed(order), reversed(b)):
            gt = F.col(c) < F.lit(bv) if d else F.col(c) > F.lit(bv)
            expr = gt | ((F.col(c) == F.lit(bv)) & expr)
        return expr

    def _search_tree(order, bnds, leaf, strict: bool = False) -> F.Column:
        # Binary search over sorted boundary tuples: bnds[i] separates id i
        # from i+1; row >= bnds[i] => id > i. One root-to-leaf path of
        # nested WHENs per row (lazy evaluation), log2(len) comparisons.
        def rec(lo: int, hi: int) -> F.Column:
            if lo == hi:
                return leaf(lo)
            mid = (lo + hi) // 2
            return F.when(
                _cmp_boundary(order, bnds[mid], strict), rec(mid + 1, hi)
            ).otherwise(rec(lo, mid))

        return rec(0, len(bnds))

    shard_bnds = {}
    for out_col, order in specs:
        srt = sorted(sample, key=_key(order))
        bnds = []
        for i in range(1, shards):
            pos = (i * len(srt)) // shards
            if 0 < pos < len(srt):
                b = tuple(srt[pos][col_idx[c]] for c, _ in order)
                if not bnds or b != bnds[-1]:
                    bnds.append(b)
        shard_bnds[out_col] = bnds
    sh_names = [f"_sh_{o}" for o, _ in specs]
    # NARROW staging frame: only the order columns + shard ids ride the
    # checkpoint the counts/sliver jobs read; the final tile assignment
    # re-evaluates the (log-cost) tile trees on the original frame, so
    # the wide payload is never duplicated into a second block set.
    staged = rows.select(
        *all_cols,
        *[
            _search_tree(order, shard_bnds[o], F.lit).alias(f"_sh_{o}")
            for o, order in specs
        ],
    ).localCheckpoint(eager=False)

    # Per-metric shard margins in ONE aggregate: explode to (metric,
    # shard) pairs so the map-side combine is bounded at
    # |metrics|*|shards| rows per task regardless of how weakly the
    # metrics correlate (a joint groupBy measured ~600k partial rows).
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("m"), F.col(sn).alias("s"))
                for i, sn in enumerate(sh_names)
            ]
        )
    ).alias("ms")
    cnt_rows = (
        staged.select(pairs)
        .groupBy("ms.m", "ms.s")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    by_metric: dict[int, dict[int, int]] = {}
    for r in cnt_rows:
        by_metric.setdefault(r["m"], {})[r["s"]] = r["cnt"]

    # Cumulative tile sizes -> boundary ranks; exclusive shard offsets ->
    # (shard, local offset) per boundary. Pure index arithmetic.
    q, rem = divmod(n, tiles)
    cut_ranks = []
    acc = 0
    for t in range(1, tiles):  # last tile needs no upper boundary
        acc += q + (1 if t <= rem else 0)
        if 0 < acc < n or (acc == n and t < tiles):
            cut_ranks.append(acc)

    tile_cols = []
    for i, (out_col, order) in enumerate(specs):
        cnts = by_metric.get(i, {})
        offsets, acc2 = {}, 0
        for s in range(max(cnts, default=0) + 1):
            offsets[s] = acc2
            acc2 += cnts.get(s, 0)
        # boundary rank k lives in shard s where offsets[s] < k <= offsets[s]+cnt
        locate: dict[int, list[int]] = {}
        for k in sorted(set(cut_ranks)):
            for s in sorted(cnts):
                if offsets[s] < k <= offsets[s] + cnts[s]:
                    locate.setdefault(s, []).append(k - offsets[s])
                    break
        btuples = []
        if locate:
            sh_col = f"_sh_{out_col}"
            w = Window.partitionBy(sh_col).orderBy(
                *[F.desc(c) if d else F.asc(c) for c, d in order]
            )
            sliver = (
                staged.filter(F.col(sh_col).isin(list(locate)))
                .withColumn("_rn", F.row_number().over(w))
            )
            pick = None
            for s, js in locate.items():
                cond = (F.col(sh_col) == s) & F.col("_rn").isin(js)
                pick = cond if pick is None else (pick | cond)
            got = sliver.filter(pick).select(
                sh_col, "_rn", *[c for c, _ in order]
            ).collect()
            by_rank = {
                offsets[r[sh_col]] + r["_rn"]: tuple(r[c] for c, _ in order)
                for r in got
            }
            # one boundary PER cut rank - duplicate cut ranks (empty
            # tiles when n < tiles) repeat their boundary, so the strict
            # count below still lands every row in its exact NTILE group
            btuples = [by_rank[k] for k in cut_ranks]
        # tile = 1 + count(boundaries b : row > b); boundary row is the
        # LAST row of its tile, so strict "greater" is exact.
        tile_cols.append(
            (
                _search_tree(
                    order, btuples, lambda j: F.lit(j + 1), strict=True
                )
                if btuples
                else F.lit(1)
            ).cast("int").alias(out_col)
        )
    return rows.select("*", *tile_cols), n


def ntile_from_rank(rank_col: str, n_rows: int, tiles: int = 5) -> F.Column:
    """NTILE(tiles) from a unique 1-based global rank (e.g. from
    `ranked_by_range`) — the exact SQL semantics in closed form: the first
    (n mod tiles) groups get ceil(n/tiles) rows, the rest floor(n/tiles).
    Pure integer arithmetic, bit-identical to window NTILE on any engine;
    with the rank coming from the sharded scan this replaces the
    single-partition NTILE sort wholesale."""
    q, r = divmod(n_rows, tiles)
    lim = r * (q + 1)
    big = f"cast((({rank_col} - 1) div {q + 1}) + 1 as int)"
    if q == 0:
        return F.expr(big)  # fewer rows than tiles: group = rank
    return F.expr(
        f"CASE WHEN {rank_col} <= {lim} THEN {big} "
        f"ELSE cast({r} + (({rank_col} - {lim} - 1) div {q}) + 1 as int) END"
    )


def _bucket_col(vcol: str, width: int) -> F.Column:
    """floor(value / width) as a long; width 1 short-circuits to the raw
    value (the histogram explode evaluates this per metric per row)."""
    if width == 1:
        return F.col(vcol)
    return F.floor(F.col(vcol) / F.lit(width))


def histogram_exact_ntiles(
    pc: DataFrame,
    specs: list,
    tie_col: str,
    tiles: int = 5,
) -> DataFrame:
    """Exact NTILE(tiles) for several INTEGER-metric total orders over the
    same cheap-to-rescan frame — the bucketed-histogram specialization of
    `exact_ntiles` (round 11). Profiling the fused order-statistic scan at
    sf16 (VERDICT r10 #2) showed its cost was the TWO localCheckpoint
    materializations plus ~8 sequential driver-coordinated jobs; integer
    metrics admit a 3-job plan over one materialization:

    1. ONE histogram job: every metric's value-bucket counts
       (floor(value / width)) in a single explode + groupBy — output is
       bounded by sum(range_m / width_m) buckets (index metadata), never
       by rows. Width-1 buckets pin a SINGLE value, so within them the
       order is purely the tiebreaker: those buckets sub-histogram by
       floor(tie / 2^16) in the same pass, which keeps the later sliver
       tiny even when a cut lands inside a 300k-row tie set (the
       frequency metric at sf16);
    2. driver arithmetic places each NTILE cut rank inside one (metric,
       bucket, tie-sub-bucket, residual) — prefix sums of the collected
       histogram, two levels deep;
    3. ONE sliver job reads ONLY the boundary (sub-)buckets (range
       predicates that push into the parquet scan: ~10^2-10^4 rows per
       cut, never a full tie set), sorts each tiny partition in
       parallel, and collects the exact boundary (value, tie) tuples;
    4. tile assignment is 4 comparisons per metric riding the next scan —
       no window, no exchange, no sort anywhere on the full frame.

    `specs`: [(out_col, value_col, bucket_width)] — value columns must be
    integral, NON-NULL, and ASCENDING in the desired order (callers negate
    for DESC); `tie_col` is the unique integer tiebreaker (ASC). `pc`
    should be parquet-backed (the caller materializes once): jobs 1/3/4
    each rescan it, and rescanning a columnar file beats caching measured
    (2.2s write+3 reads vs 3.3s cache build at sf16).

    Exactness: buckets partition the value axis monotonically, so global
    rank order = (bucket, value, tie) order; the boundary row at each cut
    rank is unique (total order), and strict greater-than against the
    tiles-1 boundary tuples reproduces NTILE's first-(n mod t)-groups-get-
    ceil split bit-for-bit (oracle-pinned by rfm_customer_segments and
    tests/test_round7_ops.py)."""
    # Tie sub-bucket width for width-1 (single-value) buckets. 2^18, not
    # 2^16 (round 12): at sf16 the finer width made the recency metric's
    # histogram 42k groups (2084 values x ~37 key sub-buckets of ~31 rows
    # each) — collect transfer + driver prefix-sum time for no sliver
    # benefit, since a sliver only needs a sub-bucket SMALLER than ~10^5
    # rows to stay off the full tie set. 2^18 keeps the worst heavy-tie
    # sliver bounded (~10^4-10^5 rows through a parallel tiny sort) while
    # quartering the histogram metadata.
    KW = 1 << 18

    def _kb(vcol_width) -> F.Column:
        width = vcol_width[2]
        if width == 1:
            return F.floor(F.col(tie_col) / F.lit(KW))
        return F.lit(0)

    hist_pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("m"),
                    _bucket_col(spec[1], spec[2]).alias("b"),
                    _kb(spec).alias("kb"),
                )
                for i, spec in enumerate(specs)
            ]
        )
    ).alias("x")
    hist = (
        pc.select(hist_pairs)
        .groupBy("x.m", "x.b", "x.kb")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    by_metric: dict[int, dict[int, dict[int, int]]] = {}
    for r in hist:
        by_metric.setdefault(r["m"], {}).setdefault(r["b"], {})[r["kb"]] = (
            r["cnt"]
        )
    n = sum(
        sum(kbs.values()) for kbs in by_metric.get(0, {}).values()
    )
    if n == 0:
        return pc.select(
            "*", *[F.lit(1).alias(out) for out, _, _ in specs]
        )
    q, rem = divmod(n, tiles)
    cut_ranks = []
    acc = 0
    for t in range(1, tiles):
        acc += q + (1 if t <= rem else 0)
        cut_ranks.append(acc)
    if not cut_ranks:  # tiles=1: everyone is tile 1, no boundary to locate
        return pc.select(
            "*", *[F.lit(1).alias(out) for out, _, _ in specs]
        )

    # Place every cut rank inside a (metric, bucket, tie-sub-bucket,
    # residual) — duplicate cut ranks (n < tiles) repeat their boundary,
    # keeping the strict-greater assignment exact for empty tiles. The
    # sub-bucket level is only order-consistent when the bucket pins one
    # value (width 1); wider buckets carry kb=0 for all rows.
    locate: dict[tuple[int, int, int], list[tuple[int, int]]] = {}
    for i in range(len(specs)):
        h = by_metric[i]
        cum = 0
        ci = 0
        for b in sorted(h):
            kbs = h[b]
            total = sum(kbs.values())
            while ci < len(cut_ranks) and cum < cut_ranks[ci] <= cum + total:
                r1 = cut_ranks[ci] - cum
                kcum = 0
                for kb in sorted(kbs):
                    c = kbs[kb]
                    if kcum < r1 <= kcum + c:
                        locate.setdefault((i, b, kb), []).append(
                            (ci, r1 - kcum)
                        )
                        break
                    kcum += c
                ci += 1
            cum += total
            if ci == len(cut_ranks):
                break

    # ONE scan for every boundary (sub-)bucket: OR of range predicates
    # (push into the parquet scan), then an explode-tag keeps each
    # surviving row under the sliver it belongs to — a union of
    # per-bucket scans would re-open the file once per cut (measured ~1s
    # of pure scan setup at 12 cuts), and without the tie sub-bucket a
    # single frequency cut dragged a 315k-row tie set through the window
    # sort (measured 1.3-1.7s; now ~10^4 rows total).
    keep = None
    for (i, b, kb) in locate:
        _, vcol, width = specs[i]
        cond = (F.col(vcol) >= b * width) & (F.col(vcol) < (b + 1) * width)
        if width == 1:
            cond = cond & (F.col(tie_col) >= kb * KW) & (
                F.col(tie_col) < (kb + 1) * KW
            )
        keep = cond if keep is None else (keep | cond)
    tagged = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("m"),
                    _bucket_col(spec[1], spec[2]).alias("b"),
                    _kb(spec).alias("kb"),
                    F.col(spec[1]).alias("v"),
                    F.col(tie_col).alias("k"),
                )
                for i, spec in enumerate(specs)
            ]
        )
    ).alias("x")
    member = None
    for (i, b, kb) in locate:
        cond = (
            (F.col("x.m") == i)
            & (F.col("x.b") == b)
            & (F.col("x.kb") == kb)
        )
        member = cond if member is None else (member | cond)
    sliver = (
        pc.filter(keep)
        .select(tagged)
        .filter(member)
        .select(
            F.col("x.m").alias("_m"),
            F.col("x.b").alias("_b"),
            F.col("x.kb").alias("_kb"),
            F.col("x.v").alias("_v"),
            F.col("x.k").alias("_k"),
        )
    )
    w = Window.partitionBy("_m", "_b", "_kb").orderBy("_v", "_k")
    sliver = sliver.withColumn("_rn", F.row_number().over(w))
    # A residual may serve SEVERAL cut indexes (duplicate cut ranks when
    # n < tiles), so the map carries a list per picked row.
    want: dict[tuple[int, int, int, int], list[int]] = {}
    pick = None
    for (i, b, kb), cuts in locate.items():
        for ci, res in cuts:
            want.setdefault((i, b, kb, res), []).append(ci)
            cond = (
                (F.col("_m") == i)
                & (F.col("_b") == b)
                & (F.col("_kb") == kb)
                & (F.col("_rn") == res)
            )
            pick = cond if pick is None else (pick | cond)
    got = sliver.filter(pick).collect()
    bounds: dict[int, dict[int, tuple[int, int]]] = {}
    for r in got:
        for ci in want[(r["_m"], r["_b"], r["_kb"], r["_rn"])]:
            bounds.setdefault(r["_m"], {})[ci] = (r["_v"], r["_k"])

    tile_cols = []
    for i, (out_col, vcol, _) in enumerate(specs):
        e = F.lit(1)
        for ci in range(len(cut_ranks)):
            bv, bk = bounds[i][ci]
            gt = (F.col(vcol) > bv) | (
                (F.col(vcol) == bv) & (F.col(tie_col) > bk)
            )
            e = e + gt.cast("int")
        tile_cols.append(e.cast("int").alias(out_col))
    return pc.select("*", *tile_cols)
