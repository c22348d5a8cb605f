"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact, the correctness oracle).
Scale path: LSH (random-hyperplane) bucketing so the candidate join is
bucket-local, plus an IVF variant (KMeans coarse quantizer) for recall
control.  Vector math is array<double> expressions (zip_with/aggregate)
— JVM-side, no Python in the row loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — same accumulation order as a scalar
    loop, so results are bit-comparable across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )

def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))

def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))

def _as_double(vec_col: Column | str) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: x.cast("double"))

def knn_brute_force(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Broadcast the (small) query set against the corpus scan → per-query
    window top-k.  One shuffle (on query_id) sized k×|queries| after
    partial ranking; the corpus is never shuffled.  Excludes self-matches
    when ids collide.  Deterministic: ties break on neighbor id.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias(query_id_col), _as_double(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "cosine", F.col("rk").alias("rank"))
    )

# --- LSH (random hyperplanes) ----------------------------------------------

def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature against fixed hyperplanes → int bucket id.
    Planes are deterministic constants (seeded offline) so the plan is
    pure expression — no model state."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot_expr(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket

def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket;
    exact cosine ranks within bucket.  At 100 TB the corpus is
    pre-bucketed (partitioned by bucket) so a query touches one
    partition's worth of vectors."""
    from pyspark.sql import Window

    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
    c = c.withColumn("bucket", hyperplane_signature(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias(query_id_col), _as_double(vec_col).alias("qv")
    ).withColumn("bucket", hyperplane_signature(F.col("qv"), planes))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "cosine", F.col("rk").alias("rank"))
    )

def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_lists: int = 8,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: KMeans coarse quantizer buckets the corpus;
    each query probes its `nprobe` nearest lists and ranks exactly inside
    them.  At 100 TB the assigned table is persisted partitioned by
    list_id, so a query touches nprobe partitions instead of the corpus.
    """
    import numpy as np
    from pyspark.sql import Window

    model, assigned = ivf_index(corpus, n_lists, id_col, vec_col, seed)
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])
    q_rows = queries.select(id_col, vec_col).collect()
    probe_pairs = []
    for r in q_rows:
        qv = np.array(r[1], dtype=np.float64)
        d = ((centers - qv) ** 2).sum(axis=1)
        for lid in np.argsort(d)[:nprobe]:
            probe_pairs.append((r[0], int(lid)))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_pairs, f"{query_id_col} long, list_id int")
    q = queries.select(
        F.col(id_col).alias(query_id_col), _as_double(vec_col).alias("qv")
    ).join(F.broadcast(probes), query_id_col)
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"), "list_id"
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "cosine", F.col("rk").alias("rank"))
    )

def ivf_index(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF coarse quantizer: KMeans over the corpus; returns (model,
    assigned DataFrame with `list_id`).  Scale path: persist the assigned
    table partitioned by list_id; queries probe nprobe nearest lists."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        F.col(id_col), F.col(vec_col), array_to_vector(_as_double(vec_col)).alias("features")
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="features", predictionCol="list_id")
    model = km.fit(feat)
    return model, model.transform(feat).select(id_col, vec_col, "list_id")
