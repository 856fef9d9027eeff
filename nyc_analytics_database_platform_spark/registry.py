"""Query registry backing the driver contract in __spark_entry__.py.

Every implemented operator from SURVEY.md section 2 registers here with:
- a callable (spark, sf_dir) -> DataFrame  (the Spark-first implementation)
- an equivalent ANSI-SQL oracle string DuckDB can run on the same parquet
  tables (None only for genuinely non-SQL-expressible ops -> the driver then
  records a weaker rows-only check).

Column-name discipline: the driver sorts columns by name before value-hashing,
so every computed column is aliased identically in the Spark plan and the
oracle SQL. Numeric discipline (see verify.py): double SUM/AVG results are
order-dependent in the last ulp, so money-style aggregates cast inputs to
DECIMAL first (exact, order-independent) and cast the final value back to
DOUBLE; both engines then produce bit-identical values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def _load_all() -> None:
    # Importing the query modules populates the registry.
    from nyc_analytics_database_platform_spark import queries as _q  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]
