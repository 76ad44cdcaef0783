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
    to `dim` — zip_with ignores trailing mismatch harmlessly).

    This is the pure-Catalyst form; it evaluates n_planes × dim
    interpreted multiply-adds per row, so the hot paths
    (`cosine_topk_lsh`, `embedding_near_dups`) use the Arrow kernels
    below instead — same planes, same sign convention, one BLAS matmul
    per record batch. Kept as the dependency-free reference expression."""
    rng = np.random.default_rng(seed)
    bits = []
    planes = rng.standard_normal((n_planes, 512))
    for p, plane in enumerate(planes):
        lit = _lit_vec(plane[:dim])
        dot = f"aggregate(zip_with({vec_col}, {lit}, (x, y) -> x * y), cast(0.0 as double), (s, x) -> s + x)"
        bits.append(f"CASE WHEN ({dot}) > 0 THEN shiftleft(1L, {p}) ELSE 0L END")
    return F.expr(" + ".join(bits))


def hyperplanes(n_planes: int, seed: int = 42) -> np.ndarray:
    """The seeded plane matrix every bucketing path shares. Generated as
    one (n_planes, 512) row-major draw so a SMALLER n_planes with the
    same seed yields a prefix of a larger one — kernel and driver-side
    query bucketing stay consistent at any plane count."""
    return np.random.default_rng(seed).standard_normal((n_planes, 512))


def _batch_sign_bits(vcol, P: np.ndarray) -> np.ndarray:
    """(n, n_planes) bool sign bits for one Arrow list<double> column:
    zero-copy flatten → one X @ Pᵀ matmul when the batch's dims are
    uniform (the normal case), per-row dots otherwise. Sign convention
    is `dot > 0`, identical to `hyperplane_bucket` and the driver-side
    query bucketing in `cosine_topk_lsh`."""
    offs = vcol.offsets.to_numpy()
    vals = vcol.values.to_numpy(zero_copy_only=False)
    n = len(offs) - 1
    lens = np.diff(offs)
    if n and (lens == lens[0]).all():
        d = int(lens[0])
        X = vals[offs[0]: offs[-1]].reshape(n, d)
        return (X @ P[:, :d].T) > 0
    bits = np.zeros((n, len(P)), dtype=bool)
    for i in range(n):
        x = vals[offs[i]: offs[i + 1]]
        bits[i] = (P[:, : len(x)] @ x) > 0
    return bits


def attach_hyperplane_bucket(dv: DataFrame, n_planes: int = 8,
                             seed: int = 42) -> DataFrame:
    """(id, v:array<double>) → (id, v, bucket:long) — the single-key LSH
    bucket as one Arrow matmul + packbits per record batch. n_planes ≤
    63 so the key fits an int64."""
    assert n_planes <= 63, "single-key bucket packs into one int64"
    P = hyperplanes(n_planes, seed)
    pow2 = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    def kernel(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            bits = _batch_sign_bits(rb.column(1), P)
            bucket = (bits.astype(np.uint64) @ pow2).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), rb.column(1), pa.array(bucket, type=pa.int64())],
                names=["id", "v", "bucket"],
            )

    id_t = dv.schema["id"].dataType.simpleString()
    return dv.mapInArrow(kernel, f"id {id_t}, v array<double>, bucket bigint")


def hyperplane_band_rows(dv: DataFrame, n_planes: int, n_bands: int,
                         seed: int = 42) -> DataFrame:
    """(id, v:array<double>) → (id, band:int, bkey:long) — banded LSH
    keys straight from one Arrow kernel: X @ Pᵀ → sign bits → each
    band's w = n_planes/n_bands bits packed into an int64. Emitting the
    band rows inside the kernel (instead of bucket-then-posexplode)
    keeps the shuffle 3 scalar columns wide and drops the int64
    total-bucket ceiling: n_planes may exceed 64 as long as each BAND
    key fits (w ≤ 63), which is what lets the near-dup path run wide,
    selective keys (e.g. 144 planes / 6 bands of 24 bits)."""
    w = n_planes // n_bands
    assert w * n_bands == n_planes and w <= 63
    P = hyperplanes(n_planes, seed)
    pow2 = (np.uint64(1) << np.arange(w, dtype=np.uint64))

    def kernel(batches):
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            bits = _batch_sign_bits(rb.column(1), P)
            # (n, n_bands) int64 band keys in one reshape + matmul
            keys = (
                bits.reshape(n, n_bands, w).astype(np.uint64) @ pow2
            ).astype(np.int64)
            ids = rb.column(0).take(pa.array(np.repeat(np.arange(n), n_bands)))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(np.tile(np.arange(n_bands, dtype=np.int32), n)),
                    pa.array(keys.ravel(), type=pa.int64()),
                ],
                names=["id", "band", "bkey"],
            )

    id_t = dv.schema["id"].dataType.simpleString()
    return dv.select("id", "v").mapInArrow(
        kernel, f"id {id_t}, band int, bkey bigint"
    )


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
    planes = hyperplanes(n_planes, seed)
    qbucket = 0
    for p, plane in enumerate(planes):
        if float(np.dot(q, plane[: len(q)])) > 0:
            qbucket |= 1 << p
    dv = attach_hyperplane_bucket(
        df.select(
            F.col(id_col).alias("id"),
            F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
        ),
        n_planes,
        seed,
    ).withColumnRenamed("id", id_col)
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


def train_ivf_centroids_kmeanspar(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    oversample: int | None = None,
    n_rounds: int = 3,
    n_iter: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """k-means‖ (Bahmani et al., VLDB 2012) spherical coarse-centroid
    trainer — the in-Spark path for codebooks past the driver-sample
    budget of `train_ivf_centroids`. No step collects more than the
    candidate set (~oversample × n_rounds vectors); the full table is
    only ever scanned, never gathered.

    1. seed candidate: the vector with min xxhash64(id) — deterministic
       under any partitioning;
    2. `n_rounds` distributed oversampling rounds: every row computes
       its spherical distance d² = 1 − max-dot to the nearest current
       candidate (Arrow-batched matmul, closure-broadcast candidates)
       and SELF-selects with probability min(1, ℓ·d²/Σd²) using a
       seeded per-(id, round) hash — no RNG state anywhere;
    3. parallel assignment: one more scan votes each row to its nearest
       candidate; the groupBy counts are the candidate weights;
    4. driver finish: weighted Lloyd over the tiny candidate set down
       to `n_centroids`, L2-normalized (assignment by max dot == max
       cosine, as everywhere else in this module).
    """
    from pyspark.sql.functions import pandas_udf

    ell = oversample or 2 * n_centroids

    # raw double vectors; L2 normalization happens INSIDE the Arrow
    # kernels (a pandas UDF whose argument is a higher-order-function
    # expression fails Python-UDF extraction under an aggregate —
    # verified on Spark 4.1 — and NumPy normalization is faster anyway)
    # `seed` is folded into the per-row hash, so BOTH the seed-candidate
    # choice (min h) and every round's sampling hash vary with it — a
    # dangling seed parameter would silently hand every caller the
    # identical codebook
    dv = df.select(
        F.xxhash64(F.col(id_col).cast("string"), F.lit(int(seed))).alias("h"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )

    def _norm(X: np.ndarray) -> np.ndarray:
        return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    first = dv.orderBy("h").limit(1).collect()
    if not first:
        raise ValueError("empty input")
    cand = _norm(np.asarray([list(first[0]["v"])], dtype=np.float64))

    def _dist_udf(C: np.ndarray):
        @pandas_udf("double")
        def d2(vecs: pd.Series) -> pd.Series:
            X = _norm(np.stack(vecs.map(np.asarray)).astype(np.float64))
            return pd.Series(1.0 - np.max(X @ C.T, axis=1))
        return d2

    for rnd in range(n_rounds):
        d2 = _dist_udf(cand)
        # no clamp around the UDF: wrapping a PythonUDF in greatest()
        # leaves it under an interpreted expression (unevaluable), and a
        # tiny negative d² (fp noise when a row == a candidate) selects
        # nothing — exactly right. Persisted for the round: the Σd²
        # aggregate and the sampling filter both consume d2, and the
        # Arrow matmul is the round's dominant cost — without the
        # persist every round pays it twice (spills to disk if the
        # (h, v, d2) projection outgrows memory).
        scored = dv.withColumn("d2", d2(F.col("v"))).persist()
        try:
            total = scored.agg(F.sum("d2")).first()[0] or 0.0
            if total <= 0:
                break  # every row coincides with a candidate already
            # seeded per-(id, round) uniform in [0, 1): select iff
            # u < ℓ·d²/Σd² — the k-means|| oversampling step, RNG-free
            u = (
                F.pmod(F.xxhash64(F.col("h"), F.lit(rnd)), F.lit(1 << 30))
                / float(1 << 30)
            )
            picked = scored.where(
                u < F.lit(float(ell)) * F.col("d2") / F.lit(float(total))
            )
            # collect() row order is partition-dependent; the candidate
            # ORDER feeds the Lloyd init tie-break, so sort by the
            # content hash to stay deterministic under any partitioning
            new = sorted(picked.select("h", "v").collect(), key=lambda r: r["h"])
        finally:
            scored.unpersist()
        if new:
            cand = np.concatenate(
                [cand, _norm(np.asarray([list(r["v"]) for r in new], dtype=np.float64))]
            )

    # parallel assignment → candidate weights (≤ |cand| rows collected)
    C = cand
    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        X = _norm(np.stack(vecs.map(np.asarray)).astype(np.float64))
        return pd.Series(np.argmax(X @ C.T, axis=1).astype(np.int32))

    wrows = dv.select(nearest(F.col("v")).alias("c")).groupBy("c").count().collect()
    w = np.zeros(len(cand))
    for r in wrows:
        w[int(r["c"])] = float(r["count"])

    # driver finish: weighted spherical Lloyd down to n_centroids,
    # initialized from the heaviest candidates (deterministic)
    k = min(n_centroids, len(cand))
    order = np.lexsort((np.arange(len(cand)), -w))
    Ck = cand[order[:k]].copy()
    for _ in range(n_iter):
        assign = np.argmax(cand @ Ck.T, axis=1)
        for c in range(k):
            m = assign == c
            if w[m].sum() > 0:
                Ck[c] = np.average(cand[m], axis=0, weights=w[m])
        Ck /= np.maximum(np.linalg.norm(Ck, axis=1, keepdims=True), 1e-12)
    return Ck


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
