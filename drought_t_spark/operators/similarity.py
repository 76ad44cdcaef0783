"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: one scan, JVM-side
zip_with/aggregate dot products, TakeOrderedAndProject for the top-k —
no shuffle beyond the final k-row reduce. The scale path is
random-hyperplane LSH bucketing (probe only the query's bucket —
candidates shrink by ~2^n_planes) — same hyperplanes both sides,
deterministic from the seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(v) -> str:
    return "array(" + ",".join(f"cast({float(x)!r} as double)" for x in v) + ")"


def cosine_expr(a: str, b: str) -> Column:
    """Cosine similarity of two array<double> columns (JVM-side)."""
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (s, x) -> s + x)"
    na = f"sqrt(aggregate({a}, cast(0.0 as double), (s, x) -> s + x * x))"
    nb = f"sqrt(aggregate({b}, cast(0.0 as double), (s, x) -> s + x * x))"
    return F.expr(f"({dot}) / nullif(({na}) * ({nb}), 0.0)")


def cosine_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k vs a constant query vector."""
    q = _lit_vec(query_vec)
    scored = df.select(
        F.col(id_col),
        cosine_expr(f"transform({vec_col}, x -> cast(x as double))", q).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def hyperplane_bucket(vec_col: str, n_planes: int = 12, seed: int = 42,
                      dim: int = 64) -> Column:
    """LSH bucket id: sign bits of dot products with seeded random
    hyperplanes (deterministic; planes inlined as literals, truncated
    to `dim` — zip_with ignores trailing mismatch harmlessly)."""
    rng = np.random.default_rng(seed)
    bits = []
    planes = rng.standard_normal((n_planes, 512))
    for p, plane in enumerate(planes):
        lit = _lit_vec(plane[:dim])
        dot = f"aggregate(zip_with({vec_col}, {lit}, (x, y) -> x * y), cast(0.0 as double), (s, x) -> s + x)"
        bits.append(f"CASE WHEN ({dot}) > 0 THEN shiftleft(1L, {p}) ELSE 0L END")
    return F.expr(" + ".join(bits))


def cosine_topk_lsh(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH with multi-probe:
    scan buckets within `probe_hamming` sign-bit flips of the query's
    bucket (near neighbors most often differ by exactly one marginal
    hyperplane, so hamming-1 probing multiplies recall for a
    (1+n_planes)/2^n_planes fraction of the data scanned). Recall < 1 by
    design; `cosine_topk` is the exact baseline."""
    q = np.asarray(query_vec, dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, 512))
    qbucket = 0
    for p, plane in enumerate(planes):
        if float(np.dot(q, plane[: len(q)])) > 0:
            qbucket |= 1 << p
    dv = df.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).withColumn("bucket", hyperplane_bucket("v", n_planes, seed, dim=len(q)))
    near = F.bit_count(
        F.col("bucket").bitwiseXOR(F.lit(qbucket))
    ) <= probe_hamming
    scored = dv.where(near).select(
        id_col, cosine_expr("v", _lit_vec(q)).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def train_ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_n: int = 4096,
    n_iter: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means coarse centroids for IVF, trained on a
    DETERMINISTIC sample: rows ordered by xxhash64(id) (stable under any
    partitioning), capped at `sample_n`, Lloyd-iterated on the driver.
    The collect is bounded by sample_n × dim floats — at 100 TB a 100k ×
    1k sample is still ~800 MB-free territory (tens of MB); k-means||
    inside Spark is the alternative if the sample must grow, and the
    assign/probe expressions downstream don't change either way.
    Centroids are L2-normalized (spherical k-means: assignment by max
    dot product == max cosine)."""
    rows = (
        df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([list(r["v"]) for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def _topk_ivf_udf(df, q, cents, k, id_col, vec_col, n_probe) -> DataFrame:
    """IVF scan with Arrow-batched cell assignment: one NumPy matmul +
    argmax per record batch (closure-captured centroids — Spark ships
    them once per executor, exactly what a broadcast would do for an
    ndarray). The probed-cell filter runs inside the same pass so
    un-probed vectors never cross into the JVM scoring stage."""
    from pyspark.sql.functions import pandas_udf

    probe = set(int(x) for x in np.argsort(-(cents @ q))[:n_probe])
    C = cents.astype(np.float64)

    @pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.map(np.asarray)).astype(np.float64)
        return pd.Series(np.argmax(X @ C.T, axis=1).astype(np.int32))

    dv = df.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).withColumn("cell", cell_of(F.col("v")))
    cand = dv.where(F.col("cell").isin(list(probe)))
    scored = cand.select(id_col, cosine_expr("v", _lit_vec(q)).alias("score"))
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def cosine_topk_ivf(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: vectors are assigned to their nearest
    coarse centroid (spherical-k-means-trained over a deterministic
    sample by default — pass `centroids` to reuse a trained set across
    queries), and only the query's `n_probe` nearest cells are scanned
    with exact cosine. Candidate count shrinks ~n_probe/n_centroids.
    Recall is ~1 for near-duplicate neighbors (they share the query's
    cell) and < 1 by design in the weak-similarity regime —
    `cosine_topk` is the exact baseline, `cosine_topk_lsh` the
    hyperplane alternative."""
    q = np.asarray(query_vec, dtype=np.float64)
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(df, id_col, vec_col, n_centroids, seed=seed)
    )
    if cents.size > 4096:
        # large codebooks: the inlined-literal argmax expression grows
        # as n_centroids × dim and is interpreted per element — switch
        # to the Arrow-batched matmul path (same assignment, closure-
        # broadcast centroids, one BLAS argmax per record batch)
        return _topk_ivf_udf(df, q, cents, k, id_col, vec_col, n_probe)

    # driver-side probe list: the query's n_probe nearest centroids
    probe = np.argsort(-(cents @ q))[:n_probe].tolist()

    # assignment expression: argmax of centroid dot products. Double
    # let-binding: the cast vector is built once, AND the dot-product
    # array is bound once (array_position + array_max over the same
    # `ds`) — textually repeating {dots} would re-evaluate all
    # n_centroids × dim multiply-adds per row.
    dots = ", ".join(
        "aggregate(zip_with(v, " + _lit_vec(c) + ", (x, y) -> x * y),"
        " cast(0.0 as double), (s, x) -> s + x)"
        for c in cents
    )
    assign = (
        f"transform(array(transform({vec_col}, x -> cast(x as double))), v -> "
        f"  transform(array(array({dots})), ds -> "
        f"    array_position(ds, array_max(ds))"
        f"  )[0]"
        f")[0]"
    )
    dv = df.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
        (F.expr(assign) - 1).cast("int").alias("cell"),
    )
    cand = dv.where(F.col("cell").isin(probe))
    scored = cand.select(id_col, cosine_expr("v", _lit_vec(q)).alias("score"))
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
