"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one broadcast of the query set,
`F.zip_with`-based dot product fully inside codegen. Scale path: random
hyperplane LSH bucketing (query only probes its bucket ± multiprobe) — the
IVF-style candidate reduction that survives a 100× corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Per-row vector math multiplies each row's work ~dim×queries times, so
    parallelism must track that compute volume, not the input bytes — a
    single small parquet row group would score the whole corpus on one
    core. No-op when the input already has enough partitions (a real
    sharded corpus), so no shuffle is added at scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, id_col)
    return df


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set against
    the corpus, score JVM-side, keep k per query with one aggregation
    (no global sort; per-partition partial top-k via AQE hash agg)."""
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    )
    scored = _spread(corpus, id_col).crossJoin(q).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("_qv")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 12, seed: int = 42) -> Column:
    """Sign pattern of `n_planes` fixed random hyperplanes → integer bucket.
    Plane coefficients are literals baked into the plan — no closure capture,
    no broadcast variable, identical on every executor."""
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        s = F.when(dot_expr(vec, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + s
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane signs,
    equi-join on bucket (hash join — no cross product), exact cosine within
    candidates. Recall rises with fewer planes / multiprobe; this is the IVF
    analog where the 'inverted list' is the LSH bucket."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    cb = _spread(corpus, id_col).withColumn(
        "_bkt", hyperplane_bucket(F.col(vec_col), dim, n_planes)
    )
    qb = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv")).withColumn(
            "_bkt", hyperplane_bucket(F.col("_qv"), dim, n_planes)
        )
    )
    scored = cb.join(qb, on="_bkt").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("_qv")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
