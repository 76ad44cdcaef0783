"""Deduplication operators for training-data pipelines.

All hot paths are JVM-side Catalyst expressions (higher-order array
functions + xxhash64) — no Python UDFs anywhere:

* exact dedup — hash-groupBy with a deterministic keeper (min doc id);
* MinHash + LSH — char-shingles → per-seed min of xxhash64 → banded
  signature → bucket join → candidate pairs → exact Jaccard verify;
* SimHash — 64-bit sign-aggregated word-hash fingerprint;
* n-gram Jaccard — exact similarity on candidate pairs.

Scale: LSH banding turns the O(n²) pair problem into groupBys on band
keys; the verify join touches only bucket-colliding pairs. Band keys
are integers (xxhash64), so the shuffle is cheap; skewed buckets (giant
near-dup clusters) are bounded by `max_bucket` pair capping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Groups of identical `key_cols`; keeper = min(id) (deterministic,
    unlike dropDuplicates). Output: one row per group with n_copies."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keeper"), F.count("*").cast("long").alias("n_copies")
    )


def shingles(text_col: str, k: int = 3):
    """Character k-shingle array (JVM-side, distinct)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
            f" i -> substring({text_col}, i, {k}))"
        )
    )


def minhash_signature(shingle_col: str, n_hashes: int = 32):
    """Array of n_hashes minima of seeded xxhash64 over the shingles."""
    return F.array(
        *[
            F.array_min(
                F.expr(f"transform({shingle_col}, s -> xxhash64(s, {seed}))")
            )
            for seed in range(n_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, verified with exact
    Jaccard on the shingle sets. Returns (id_a, id_b, jaccard)."""
    rows = n_hashes // bands
    sig = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .withColumn("sh", shingles("text", k))
        .withColumn("sig", minhash_signature("sh", n_hashes))
    )
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("sig", b * rows + 1, rows)).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", "bk.band", "bk.bkey")
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bkey"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = cand.withColumn(
        "jaccard",
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
    )
    return jac.where(F.col("jaccard") >= jaccard_threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace words: bit b of the fingerprint is
    1 iff Σ_words (±1 per word-hash bit b) > 0. One aggregate expression
    per doc — O(words · 64) JVM work, zero Python."""
    words = f"filter(split({text_col}, ' +'), w -> w <> '')"
    acc = (
        "aggregate("
        f"  {words},"
        "  array_repeat(0L, 64),"
        "  (acc, w) -> zip_with(acc, transform(sequence(0, 63),"
        "      b -> CASE WHEN (shiftright(xxhash64(w), b) & 1) = 1 THEN 1L ELSE -1L END),"
        "      (x, y) -> x + y))"
    )
    bits = (
        f"aggregate(transform(sequence(0, 63), b -> CASE WHEN element_at({acc}, b + 1) > 0"
        "   THEN shiftleft(1L, b) ELSE 0L END), 0L, (x, y) -> x | y)"
    )
    return df.select(
        F.col(id_col).alias("id"), F.expr(bits).alias("simhash64")
    )


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 × 16-bit sub-keys (any pair
    within hamming ≤ 3 collides on ≥1 block), verify hamming distance."""
    sh = simhash(df, id_col, text_col)
    blocked = sh.select(
        "id",
        "simhash64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        (F.shiftright("simhash64", 16 * i).bitwiseAND(F.lit(0xFFFF))).alias("bkey"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash64", "b.blk", "b.bkey")
    cand = (
        blocked.alias("a")
        .join(blocked.alias("b"), ["blk", "bkey"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash64").bitwiseXOR(F.col("b.simhash64"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.where(F.col("hamming") <= max_hamming)


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dups: random-hyperplane LSH bucket join
    (scale path), exact cosine verify on colliding pairs."""
    from drought_t_spark.operators.similarity import hyperplane_bucket, cosine_expr

    b = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).withColumn("bucket", hyperplane_bucket("v", n_planes, seed))
    cand = (
        b.alias("a")
        .join(b.alias("b"), "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr("a.v", "b.v").alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.where(F.col("cosine") >= threshold)
