"""Similarity search over embedding columns (``array<float>``).

Two physical strategies for top-k cosine neighbors:

- **Brute force** (baseline / exact): broadcast the (small) query set against
  the corpus — a broadcast nested-loop join, no shuffle of the corpus at all;
  per-query top-k via a ranking window partitioned by query id. At 100 TB the
  corpus side stays partition-parallel; only k rows per query per partition
  survive to the final shuffle when AQE applies partial top-k (the window is
  preceded by a per-partition limit in the packed variant below).
- **Sign-LSH** (scale path): H deterministic hyperplanes (portable pseudo-
  random from md5 — identical in the DuckDB oracle) hash each vector to an
  H-bit bucket; candidates = bucket collisions (+ optional multi-probe),
  verified with exact cosine. Shuffle is keyed by bucket, O(collisions).

Cosine is the order-stable double fold from functions/vectors.py, so scores —
not just ids — hash-match the oracle.

Reference parity: the reference has no vector ops (SURVEY.md §2.2 "absent");
these are the training-data-pipeline additions the target engine must carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from investigraph_etl_spark.functions import vectors as V

#: Sign-LSH geometry: number of hyperplanes (bucket bits).
N_PLANES = 6


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` ids.

    Query side is tiny → ``broadcast``; corpus is never shuffled until the
    final per-query ranking (window over ≤ n_queries * |corpus| candidate rows,
    bounded in practice by partial top-k under AQE).

    Output: (query_id, neighbor_id, cos, rank), rank 1..k, self excluded;
    deterministic tie-break by neighbor id.
    """
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cand = F.broadcast(q).crossJoin(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        V.cosine(F.col("qv"), F.col("nv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cosine_topk_sql(
    table: str = "embeddings",
    n_queries: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    cos = V.cosine_sql("q.qv", "n.nv")
    return f"""
WITH q AS (SELECT {id_col} AS query_id, {vec_col} AS qv FROM {table}
           WHERE {id_col} < {n_queries}),
n AS (SELECT {id_col} AS neighbor_id, {vec_col} AS nv FROM {table}),
scored AS (
  SELECT q.query_id, n.neighbor_id, {cos} AS cos
  FROM q CROSS JOIN n WHERE q.query_id != n.neighbor_id
)
SELECT query_id, neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id ASC) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def _plane_coef(j: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1).

    Derived from md5 of "plane:<j>:<i>" — reproduced literally in SQL so both
    engines build the same planes. Computed at plan-build time (constants in
    the plan; no per-row hashing cost).
    """
    import hashlib

    h = int(hashlib.md5(f"plane:{j}:{i}".encode()).hexdigest()[:8], 16)
    return (h / float(1 << 31)) - 1.0


def _bucket_expr(vec_col: str, dim: int, n_planes: int):
    """H-bit sign bucket: bit j = sign(dot(v, plane_j)) — array lambdas only."""
    bucket = F.lit(0)
    for j in range(n_planes):
        coefs = F.array(*[F.lit(_plane_coef(j, i)) for i in range(dim)])
        d = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), coefs, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _bucket_sql(vec_col: str, dim: int, n_planes: int) -> str:
    terms = []
    for j in range(n_planes):
        coefs = "[" + ", ".join(repr(_plane_coef(j, i)) for i in range(dim)) + "]"
        d = (
            f"list_reduce(list_prepend(0.0, "
            f"list_transform(generate_series(1, {dim}), "
            f"i -> ({vec_col})[i]::DOUBLE * ({coefs})[i])), (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN ({d}) > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


def lsh_neighbors(
    emb: DataFrame,
    dim: int = 64,
    n_planes: int = N_PLANES,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH candidate pairs verified by exact cosine >= threshold.

    The self-join is keyed on the H-bit bucket — at 10^10 vectors the shuffle
    is bucket-partitioned and candidate volume is collision-bounded; raise
    ``n_planes`` to shrink buckets. Recall < 1 by construction (the LSH
    trade); the exact variant for full recall is :func:`cosine_topk`.

    Output: (id_a, id_b, cos) with id_a < id_b.
    """
    b = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _bucket_expr(vec_col, dim, n_planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    cand = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        V.cosine(F.col("l.v"), F.col("r.v")).alias("cos"),
    )
    return cand.filter(F.col("cos") >= threshold)


def lsh_neighbors_sql(
    table: str = "embeddings",
    dim: int = 64,
    n_planes: int = N_PLANES,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    bucket = _bucket_sql(vec_col, dim, n_planes)
    cos = V.cosine_sql("l.v", "r.v")
    return f"""
WITH b AS (SELECT {id_col} AS id, {vec_col} AS v, {bucket} AS bucket FROM {table})
SELECT l.id AS id_a, r.id AS id_b, {cos} AS cos
FROM b l JOIN b r ON l.bucket = r.bucket AND l.id < r.id
WHERE {cos} >= {threshold}
"""


def embedding_neardup(
    emb: DataFrame, threshold: float = 0.4, **kw
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs = LSH neighbors at a high
    threshold (dedup is similarity search with a tighter radius)."""
    return lsh_neighbors(emb, threshold=threshold, **kw)


def embedding_neardup_sql(table: str = "embeddings", threshold: float = 0.4, **kw) -> str:
    return lsh_neighbors_sql(table, threshold=threshold, **kw)
