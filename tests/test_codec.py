"""Codec round-trip + property tests (SURVEY.md §5.2; FIXTURES.md §F4).

decode(encode(x)) == x exactly is THE invariant (BASELINE.json:2,15).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from drought_t_spark.codec import tsz1

PINNED = [
    [],
    [0],
    [2147483647],
    [-2147483648, 2147483647],
    [5] * 4096,
    list(range(2048)),
    [-2147483648, 2147483647] * 512,
    [0, 0, 0, 1],
]


@pytest.mark.parametrize("case", PINNED, ids=[f"pin{i}" for i in range(len(PINNED))])
def test_int_pinned(case):
    a = np.asarray(case, np.int32)
    out = tsz1.decode_tokens(tsz1.encode_tokens(a))
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, a)


@given(st.lists(st.integers(-(2**31), 2**31 - 1), max_size=4096))
@settings(max_examples=200, deadline=None)
def test_int_roundtrip_property(xs):
    a = np.asarray(xs, np.int32)
    np.testing.assert_array_equal(tsz1.decode_tokens(tsz1.encode_tokens(a)), a)


def test_crc_corruption_raises():
    blob = bytearray(tsz1.encode_tokens([1, 2, 3, 4, 5, 100, -7]))
    blob[12] ^= 0x5A
    with pytest.raises(tsz1.CodecError):
        tsz1.decode_tokens(bytes(blob))
    with pytest.raises(tsz1.CodecError):
        tsz1.decode_tokens(b"NOPE" + bytes(blob)[4:])


def test_compression_on_smooth_series():
    rng = np.random.default_rng(42)
    smooth = (1000 + np.cumsum(rng.integers(-3, 4, 100_000))).astype(np.int32)
    enc = tsz1.encode_tokens(smooth)
    assert len(enc) / (4 * len(smooth)) < 0.5  # ≥2× on smooth ints


@given(st.lists(st.integers(-(2**31), 2**31 - 1), max_size=2048))
@settings(max_examples=100, deadline=None)
def test_zlib_envelope_roundtrip_property(xs):
    a = np.asarray(xs, np.int32)
    np.testing.assert_array_equal(
        tsz1.decode_tokens(tsz1.wrap_zlib(tsz1.encode_tokens(a))), a
    )


def test_zlib_envelope_corruption_raises():
    blob = bytearray(tsz1.wrap_zlib(tsz1.encode_tokens([1, 2, 3, 4, 5])))
    blob[6] ^= 0x5A
    with pytest.raises(tsz1.CodecError):
        tsz1.decode_tokens(bytes(blob))


def test_compression_zipf_beats_uniform():
    """Head-heavy (realistic) token streams compress materially better
    than uniform-random ones, and the zlib envelope adds on top."""
    from drought_t_spark import synth

    n = 200_000
    uni = (
        synth._key(42, np.arange(n, dtype=np.uint64), 0x544F4B)
        % np.uint64(synth.VOCAB)
    ).astype(np.int32)
    zipf = synth.zipf_tokens(n)
    ratio = lambda toks, enc: 4 * len(toks) / len(enc)
    r_uni = ratio(uni, tsz1.encode_tokens(uni))
    r_zipf = ratio(zipf, tsz1.encode_tokens(zipf))
    r_zipf_z = ratio(zipf, tsz1.wrap_zlib(tsz1.encode_tokens(zipf)))
    assert r_zipf > r_uni
    assert r_zipf_z > r_zipf
    np.testing.assert_array_equal(
        tsz1.decode_tokens(tsz1.wrap_zlib(tsz1.encode_tokens(zipf))), zipf
    )


FLOAT_PINNED = [
    [],
    [0.0],
    [1.5] * 1000,
    [float("nan"), float("inf"), -float("inf"), 0.0, -0.0],
    [1e-310, 5e-324, 1.7976931348623157e308],
]


@pytest.mark.parametrize("case", FLOAT_PINNED, ids=[f"f{i}" for i in range(len(FLOAT_PINNED))])
def test_float_pinned(case):
    a = np.asarray(case, np.float64)
    out = tsz1.decode_floats(tsz1.encode_floats(a))
    np.testing.assert_array_equal(out.view(np.uint64), a.view(np.uint64))


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=2048))
@settings(max_examples=100, deadline=None)
def test_float_roundtrip_property(xs):
    a = np.asarray(xs, np.float64)
    out = tsz1.decode_floats(tsz1.encode_floats(a))
    np.testing.assert_array_equal(out.view(np.uint64), a.view(np.uint64))
