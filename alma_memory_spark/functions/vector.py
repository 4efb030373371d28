"""Vector math as JVM-side column expressions.

The reference's vector stage is FAISS IndexFlatIP / numpy brute-force
cosine (reference: alma/storage/sqlite_local.py:555-601). Here the
embedding is a plain ArrayType(FloatType) column, and similarity is a
whole-stage-codegen'd column expression — no Python in the hot path, no
side-car index to keep in sync. At 100 TB the scan parallelizes like any
other columnar read and the top-k is Spark's TakeOrderedAndProject.

Numeric convention: accumulate in DOUBLE with sequential left-to-right
folds (F.aggregate) so results are reproducible and match an oracle that
does the same.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two array columns, in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = dot / (|a| * |b|); NULL-safe on zero norms."""
    d = dot_product(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def l2_normalize(a: Column | str) -> Column:
    """Normalize an array column to unit L2 norm (write-time convention:
    normalized vectors make dot == cosine at read time)."""
    c = _as_double(a)
    n = l2_norm(a)
    return F.when(n > 0, F.transform(c, lambda x: x / n)).otherwise(c)
