"""Vector kernels over ``array<float>`` embedding columns.

Cosine/dot/norm are sequential left-folds over the array in DOUBLE — and the
DuckDB twins fold in the same element order with the same double rounding, so
the two engines produce bit-identical results (float→double widening is exact;
IEEE ops at equal operand order are deterministic). That is what lets the
driver value-hash similarity scores instead of merely counting rows.

Spark-side this is ``zip_with`` + ``aggregate`` — pure Catalyst array lambdas,
whole-stage codegen, no UDF. A Pandas-UDF variant exists for wide fan-out
top-k in :mod:`investigraph_etl_spark.operators.similarity`.
"""

from __future__ import annotations

import pandas  # noqa: F401 — annotation target for pandas_udf type inference
from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (order-stable across engines)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(generate_series(1, len({a})), "
        f"i -> ({a})[i]::DOUBLE * ({b})[i]::DOUBLE)), (acc, x) -> acc + x)"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_sql(a: str, b: str) -> str:
    d, na, nb = dot_sql(a, b), norm_sql(a), norm_sql(b)
    return (
        f"CASE WHEN ({na}) > 0 AND ({nb}) > 0 "
        f"THEN ({d}) / (({na}) * ({nb})) ELSE 0.0 END"
    )


def cosine_batch_udf():
    """Vectorized (Arrow/numpy) cosine — the PRODUCTION kernel for verify
    stages that score many candidate pairs. Catalyst higher-order lambdas run
    interpreted (~µs per element); numpy row-block einsum is ~100× cheaper
    per pair. NOT for oracle faces: numpy's pairwise/SIMD summation rounds
    differently from the sequential fold the DuckDB twin reproduces (values
    agree to ~1 ulp, which a value-hash does not forgive).
    """
    import numpy as np
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def _cos(va: "pandas.Series", vb: "pandas.Series") -> "pandas.Series":
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        d = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        denom = na * nb
        out = np.where(denom > 0, d / np.where(denom > 0, denom, 1.0), 0.0)
        return pandas.Series(out)

    return _cos
