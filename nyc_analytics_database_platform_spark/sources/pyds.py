"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic document generator - the pattern for plugging a non-file system
(REST endpoint, internal record service, proprietary format) into Spark as
a first-class `spark.read.format(...)` source with real partition-level
parallelism.

Determinism contract: rows are a pure function of (doc_id, seed) via integer
LCG arithmetic - no RNG state, so any partitioning of the id range yields
the same corpus (the same property operators/sampling.py relies on).

Scale: the reader splits the id range into `parts` InputPartitions; each
executor materializes only its own range (generation is O(rows/partition)
memory via batched yields). A production source would map partitions to
shards/byte-ranges of the backing service the same way.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = (
    "key value table scan filter join agg window sort merge batch stream "
    "row column vector hash spark query data fast slow big small the a"
).split()

_LANGS = ("en", "de", "fr", "es", "it")


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, (self.n + self.parts - 1) // self.parts)
        return [
            _IdRange(lo, min(lo + step, self.n), self.seed)
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            # LCG keyed by (doc_id, seed): identical output under any split
            x = (doc_id * 6364136223846793005 + partition.seed) & (2**63 - 1)
            n_tokens = 5 + (x >> 5) % 20
            toks = []
            for i in range(n_tokens):
                x = (x * 6364136223846793005 + 1442695040888963407) & (2**63 - 1)
                toks.append(_WORDS[(x >> 33) % len(_WORDS)])
            lang = _LANGS[(doc_id * 2654435761 >> 7) % len(_LANGS)]
            yield (doc_id, " ".join(toks), lang)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string"

    def reader(self, schema: StructType) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        # defined below; resolved at call time
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: spark.read.format('synthetic_docs') works
    afterwards on this session."""
    spark.dataSource.register(SyntheticDocsDataSource)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic id space: each batch
    advances the offset by `batch` ids and generates rows with the SAME
    (doc_id, seed)-keyed LCG as the batch reader - so replaying any offset
    range reproduces identical rows (the exactly-once contract Structured
    Streaming needs from a source), and stream output equals a batch read
    of the same id range (asserted in tests)."""

    def __init__(self, options: dict):
        self.batch = int(options.get("batch", 100))
        self.limit = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch, self.limit)
        return self._gen(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery
        return self._gen(start["next"], end["next"])

    def _gen(self, lo: int, hi: int):
        rd = SyntheticDocsReader(
            {"n": str(self.limit), "parts": "1", "seed": str(self.seed)}
        )
        # materialized (not a generator): the prefetch cache pickles entries
        return list(rd.read(_IdRange(lo, hi, self.seed)))
