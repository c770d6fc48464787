from .numeric import (
    F32,
    cast_i8,
    cast_i32,
    cast_u8,
    cast_u32,
    f16_bits_to_f32,
    f32,
    f32_to_f16_bits,
    logit,
    normalize_rows,
    rust_round,
    sigmoid,
)

__all__ = [
    "F32",
    "cast_i8",
    "cast_i32",
    "cast_u8",
    "cast_u32",
    "f16_bits_to_f32",
    "f32",
    "f32_to_f16_bits",
    "logit",
    "normalize_rows",
    "rust_round",
    "sigmoid",
]
