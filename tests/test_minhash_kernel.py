"""The r6 zero-copy string path of `minhash_signatures_arrow` must be
byte-identical to a straightforward per-doc reference of the same hash
family — across the cases where the Arrow-buffer arithmetic can go
wrong: nulls, empty strings, docs shorter than k, multi-byte UTF-8,
and batch-boundary positions."""

from __future__ import annotations

import numpy as np
import pytest

from drought_t_spark.operators.dedup import minhash_signatures_arrow

K, NH, SEED = 3, 32, 7


def _ref_sigs(texts: list[str | None]) -> dict[int, np.ndarray]:
    """Per-doc reference: same gram packing / splitmix64 / permutations,
    computed one document at a time with plain Python slicing."""
    rng = np.random.default_rng(SEED)
    A = (rng.integers(0, 2**62, NH, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    B = rng.integers(0, 2**63, NH, dtype=np.uint64)

    def mix(x):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    out = {}
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        if len(b) >= K:
            grams = np.array(
                [int.from_bytes(b[p : p + K], "little") for p in range(len(b) - K + 1)],
                np.uint64,
            )
            h = mix(grams)
            out[i] = np.array([np.min(A[j] * h + B[j]) for j in range(NH)], np.uint64)
        else:
            g = np.uint64(int.from_bytes(b, "little"))
            out[i] = A * mix(np.array([g], np.uint64))[0] + B
    return out


@pytest.mark.parametrize("case", ["mixed", "unicode"])
def test_arrow_kernel_matches_reference(spark, case):
    if case == "mixed":
        texts = ["hello world", "", None, "ab", "a", "abc", "x" * 500,
                 "hello world", "the quick brown fox"]
    else:
        texts = ["héllo wörld", "日本語のテキスト", "a→b→c", "émoji 🎉 test", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    ).repartition(3)
    got = {
        r["id"]: np.array(r["sig"], np.int64).view(np.uint64)
        for r in minhash_signatures_arrow(df, k=K, n_hashes=NH, seed=SEED).collect()
    }
    ref = _ref_sigs(texts)
    assert set(got) == set(ref)
    for i in ref:
        assert (got[i] == ref[i]).all(), f"doc {i} ({texts[i]!r})"
