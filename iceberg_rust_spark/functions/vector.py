"""Vector/embedding column builders — JVM-side math over array<float> columns.

Dot products and norms via ``F.aggregate``/``F.zip_with`` (builtin higher-order
functions, codegen'd): left-to-right summation in DOUBLE, which matches the
DuckDB oracle's ``list_dot_product`` over ``DOUBLE[]`` casts bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    return F.round(cosine(a, b), digits)
