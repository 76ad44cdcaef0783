from drought_t_spark.codec.tsz1 import (
    CodecError,
    decode_floats,
    decode_tokens,
    encode_floats,
    encode_tokens,
)

__all__ = [
    "CodecError",
    "encode_tokens",
    "decode_tokens",
    "encode_floats",
    "decode_floats",
]
