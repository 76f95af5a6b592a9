"""Approximate-nearest-neighbor similarity search over embedding columns.

Two strategies:
- ``cosine_topk``: brute-force — broadcast the (small) query set, one
  scan of the corpus, per-query top-k. Exact baseline; at 100 TB this
  is the per-bucket verify stage, not the outer loop.
- ``lsh_topk``: random-hyperplane LSH — signature per vector (map-side),
  bucket equi-join on band prefixes, cosine only within buckets. The
  scale path: candidate generation cost is |buckets| joins on uniform
  keys, and recall is tunable via planes/bands.

Hyperplanes are generated from a fixed seed so results are
deterministic run-to-run (required for resumable pipelines and for
tests that measure recall against the brute-force baseline).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etlutils_spark.functions.vectors import cosine_exact, cosine_fast


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exact: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    ``queries`` must be broadcast-sized (the common ANN regime: few
    queries, huge corpus). Output: (query_id, vec_id, cosine, rank).
    Self-matches (same id) are excluded.
    """
    from etlutils_spark.sources.files import spread

    cos = cosine_exact if exact else cosine_fast
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
    )
    # spread: the per-(query, vector) cosine work is the CPU stage
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, cos("__qv", "__cv").alias("cosine"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit Gaussian rows)."""
    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim).astype("float64").tolist()


def lsh_signature(vec_col, planes: list[list[float]]):
    """Sign-bit signature of a vector against each hyperplane, as an
    array<int> of 0/1 — all built-in higher-order functions."""
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(v)) for v in p])
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.array(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: vectors agreeing with the query
    on >=1 band of sign bits are candidates; cosine ranks candidates.

    Output: (query_id, vec_id, cosine, rank) — same shape as
    ``cosine_topk`` so recall is directly measurable.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, num_planes, seed)
    rpb = num_planes // bands

    def banded(df: DataFrame, ident: str) -> DataFrame:
        sig = lsh_signature(F.col(vec_col), planes)
        out = df.select(
            F.col(id_col).alias(ident), F.col(vec_col).alias(f"__v_{ident}"),
            sig.alias("__sig"),
        )
        band_cols = [
            F.concat_ws(",", *[F.element_at("__sig", b * rpb + r + 1).cast("string") for r in range(rpb)])
            .alias(f"band{b}")
            for b in range(bands)
        ]
        out = out.select(ident, f"__v_{ident}", *band_cols)
        return out.select(
            ident, f"__v_{ident}",
            F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias("band_idx", "band_sig"),
        )

    qb = banded(queries, query_id_col)
    cb = banded(corpus, id_col)
    cand = (
        cb.join(F.broadcast(qb), on=["band_idx", "band_sig"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, f"__v_{query_id_col}", f"__v_{id_col}")
        .distinct()
    )
    scored = cand.select(
        query_id_col, id_col,
        cosine_exact(f"__v_{query_id_col}", f"__v_{id_col}").alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
