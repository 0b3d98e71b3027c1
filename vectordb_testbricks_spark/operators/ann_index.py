"""IVF approximate-nearest-neighbor index (SURVEY.md §4: the performance
path mirroring the reference's IVF_FLAT/nprobe vocabulary,
2.6/common.py:882-898, workload.py:140-152).

Design (Spark-first, batch-built like any derived table):
  * build: MLlib KMeans over the vector column → per-row ``centroid_id``.
    At scale the assigned table is *persisted partitioned/bucketed by
    centroid_id*, so probing prunes file groups instead of filtering rows.
  * probe: score the nq query vectors against the tiny centroid table
    (driver-side, ≤ a few thousand rows), pick ``nprobe`` nearest lists per
    query, then run the exact brute-force ranking only on rows whose
    centroid_id is probed — the same two-phase top-k as search.py on a
    pruned scan.

Brute force remains the declared (oracle-checked) semantics; IVF trades
recall for scan fraction exactly like the reference's nprobe knob.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_testbricks_spark.functions.vector import score_expr, to_double_array


@dataclass
class IvfModel:
    assigned: DataFrame          # base columns + centroid_id
    centroids: list[list[float]]  # list index = centroid_id
    vec_col: str
    id_col: str


def build_ivf(base: DataFrame, vec_col: str, id_col: str,
              n_lists: int = 64, seed: int = 7,
              max_iter: int = 10) -> IvfModel:
    """Batch-build the IVF index: KMeans centroids + per-row assignment."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    feat = base.withColumn("_features",
                           array_to_vector(to_double_array(F.col(vec_col))))
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter,
                featuresCol="_features", predictionCol="centroid_id")
    model = km.fit(feat)
    assigned = model.transform(feat).drop("_features")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return IvfModel(assigned=assigned, centroids=centroids,
                    vec_col=vec_col, id_col=id_col)


def write_ivf(model: IvfModel, path: str) -> None:
    """Persist the assignment partitioned by centroid_id → probing becomes
    partition pruning on the read path."""
    model.assigned.write.mode("overwrite") \
        .partitionBy("centroid_id").parquet(path)


def _nearest_lists(qvec: list[float], centroids: list[list[float]],
                   nprobe: int) -> list[int]:
    """Driver-side: nprobe nearest centroids by L2 (tiny)."""
    import numpy as np

    c = np.asarray(centroids, dtype=float)
    q = np.asarray(qvec, dtype=float)
    d = ((c - q) ** 2).sum(axis=1)
    return [int(i) for i in d.argsort()[:nprobe]]


def ivf_search(model: IvfModel, queries: DataFrame, k: int = 10,
               nprobe: int = 8, metric: str = "COSINE") -> DataFrame:
    """Probe: restrict each query to its nprobe nearest inverted lists, then
    exact-rank within the pruned subset (same plan shape as knn_search)."""
    from vectordb_testbricks_spark.operators.search import _ranked

    qrows = queries.collect()  # nq is small by contract (reference nq ≤ 100)
    probe = [(int(r["query_id"]), int(c))
             for r in qrows
             for c in _nearest_lists(list(r["qvec"]), model.centroids, nprobe)]
    spark = queries.sparkSession
    probe_df = spark.createDataFrame(probe, "query_id int, centroid_id int")
    pruned = model.assigned.join(F.broadcast(probe_df), "centroid_id")
    q = queries.select("query_id", "qvec")
    score, asc = score_expr(metric, F.col(model.vec_col), F.col("qvec"))
    scored = (pruned.join(F.broadcast(q), "query_id")
              .select("query_id", model.id_col, score.alias("score")))
    return _ranked(scored, model.id_col, asc, k)
