"""Build a larger synthetic SF by replicating the driver's sf0.1 parquet
with per-key-domain offsets - the dataset behind the bench's scale-crossover
block (BENCH "scale_crossover": shows the small-SF Spark/DuckDB ratios are
fixed per-job overhead that amortizes as data grows, not plan defects).

Replication semantics: every fact row appears `factor` times with its keys
shifted into disjoint ranges (offset = replica * (max_key + 1) per domain),
so FK joins stay consistent replica-by-replica and key cardinalities scale
linearly. Dimension tables (region, nation) are NOT replicated - replicas
reference the same dims, exactly how a bigger corpus shares a fixed dim.
Document/embedding payloads are byte-identical across replicas (exact
clones - the realistic shape of a scaled web corpus; dedup operators see
5x the data AND real cross-replica duplicate mass).

DuckDB does the build (no Spark session needed); output location defaults
to the gitignored /root/repo/.scaledata/sf<x>.
"""

from __future__ import annotations

import os

import duckdb

# (table, {column: key_domain}) - columns sharing a domain get the same
# offset so FKs keep matching within a replica.
_FACT_KEYS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
_DIMS = ("region", "nation")


def _src_signature(src_dir: str, factor: int) -> str:
    """Fingerprint of the source parquet set (name/size/mtime) + factor.
    The driver REGENERATES /root/testdata between rounds, so a cached
    replica must be invalidated whenever the source bytes change."""
    parts = [f"factor={factor}"]
    for name in sorted((*_FACT_KEYS, *_DIMS)):
        p = os.path.join(src_dir, f"{name}.parquet")
        st = os.stat(p)
        parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)


def build_scaled(src_dir: str, out_dir: str, factor: int) -> str:
    """Replicate src_dir's tables `factor` times into out_dir (skips the
    build if out_dir already holds a replica of THIS source - the marker
    records a source fingerprint, so regenerated testdata forces a
    rebuild). Returns out_dir."""
    marker = os.path.join(out_dir, "_SCALED_OK")
    sig = _src_signature(src_dir, factor)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == sig:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    try:
        # one offset per key domain, from the max over every column in it
        domain_max: dict[str, int] = {}
        for table, keys in _FACT_KEYS.items():
            src = os.path.join(src_dir, f"{table}.parquet")
            for col, domain in keys.items():
                m = con.execute(
                    f"SELECT MAX({col}) FROM read_parquet('{src}')"
                ).fetchone()[0]
                domain_max[domain] = max(domain_max.get(domain, 0), int(m))

        for table in _DIMS:
            src = os.path.join(src_dir, f"{table}.parquet")
            dst = os.path.join(out_dir, f"{table}.parquet")
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}' "
                "(FORMAT PARQUET)"
            )

        for table, keys in _FACT_KEYS.items():
            src = os.path.join(src_dir, f"{table}.parquet")
            dst = os.path.join(out_dir, f"{table}.parquet")
            import pyarrow.parquet as pq

            schema = pq.read_schema(src)
            types = {
                c: con.execute(
                    f"SELECT typeof({c}) FROM read_parquet('{src}') LIMIT 1"
                ).fetchone()[0]
                for c in keys
            }
            select = ", ".join(
                (
                    # preserve the physical type: offset then cast back
                    f"CAST({c} + r.i * {domain_max[keys[c]] + 1} AS "
                    f"{types[c]}) AS {c}"
                    if c in keys
                    else c
                )
                for c in schema.names
            )
            con.execute(
                f"COPY (SELECT {select} "
                f"FROM read_parquet('{src}'), "
                f"(SELECT unnest(generate_series(0, {factor - 1})) AS i) r) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
    finally:
        con.close()
    with open(marker, "w") as f:
        f.write(sig + "\n")
    return out_dir


if __name__ == "__main__":
    import sys

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, ".scaledata", "sf0.5")
    print(build_scaled(src, out, factor))
