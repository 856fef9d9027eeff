"""Composite-key string codec - the BBL pattern as native expressions.

The reference round-trips BBL 'b-bbbbb-llll' strings to/from three ints in
Python (reference: server.py:104-109 slicing the 10-char Geoclient BBL,
:118-127 parse_bbl, :153 format). Here both directions are pure Catalyst
column expressions (format_string / split / cast) so they run JVM-side
inside whole-stage codegen - no UDF, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_key(a: Column, b: Column, c: Column) -> Column:
    """(a, b, c) -> 'a-bbbbb-cccc' (zero-padded, reference format)."""
    return F.format_string(
        "%d-%05d-%04d", a.cast("long"), b.cast("long"), c.cast("long")
    )


def parse_key(code: Column) -> tuple[Column, Column, Column]:
    """'a-bbbbb-cccc' -> three int columns (reference parse_bbl)."""
    parts = F.split(code, "-")
    return (
        parts.getItem(0).cast("int"),
        parts.getItem(1).cast("int"),
        parts.getItem(2).cast("int"),
    )
