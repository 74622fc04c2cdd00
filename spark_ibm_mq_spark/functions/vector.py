"""Vector math over ARRAY<FLOAT/DOUBLE> columns as pure SQL expressions.

`zip_with` + `aggregate` keep the arithmetic in the JVM (whole-stage
codegen over array loops) — no Arrow transfer, no Python per row. This is
the §2.2 "similarity search" primitive; at 100 TB the same expressions run
inside the LSH-bucketed join (operators/similarity.py) instead of a cross
join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ — zip_with product then aggregate sum, all codegen'd."""
    prod = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    c = _to_double(a)
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (‖a‖‖b‖); accumulation order is array order, so the
    value is deterministic and engine-comparable."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
