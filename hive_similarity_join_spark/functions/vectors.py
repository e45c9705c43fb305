"""Vector (embedding) column expressions — UDF-free.

All math is built from higher-order functions (``zip_with`` +
``aggregate``) over ``array<double>``: JVM-side, whole-stage-codegen'd,
no Python workers, no MLlib ``VectorUDT`` conversion in the hot path.

Determinism note: ``F.aggregate`` is a LEFT FOLD with a 0.0 seed — the
element-order sum. The DuckDB oracle mirrors it with
``list_reduce(list_transform(...), (x,y) -> x+y)`` (also a left fold;
IEEE ``0.0 + x == x``), which makes dot products, norms, cosine and L2
**bit-exact** across engines (verified empirically on the embeddings
table — no rounding slack needed).

Scale: per-row O(dim) arithmetic pipelined inside codegen; the expensive
part of any vector workload is the pairing join around it, not these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2(a: Column, b: Column) -> Column:
    diff2 = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x))


# Embedding dimensionality of the testdata corpus. The oracle-side
# element iteration (generate_series(1, DIM)) must agree with the
# Spark side (which iterates the physical array) — a regenerated
# testdata dim flip fails HERE, in one visible place, instead of
# silently truncating oracle sums (ADVICE r5).
DIM = 64


# --- int8 (SQ8) scalar quantization, shared by q_vec_quantize and the
# quantized-ANN path. ONE definition feeds both engines (the
# q_corpus_profile lesson, ADVICE r4): codes are integral-valued
# DOUBLES in [-127, 127] — floor(x*scale + 0.5) instead of round()
# because floor is IEEE-exact on both engines while round()'s
# half-breaking mode differs; integral doubles sum exactly in any
# order up to 2^53.
#
# Accepted residual FMA risk (ADVICE r5): the pre-floor argument
# x*scale + 0.5 is a multiply-add shape, which the CLAUDE.md FMA rule
# normally forbids in double. A fused-vs-unfused divergence only
# matters if it crosses a floor boundary, i.e. the unfused product
# lands within 1 ulp of a half-integer — improbable per element
# (~2^-52 per code) but latent across testdata regenerations. Kept as
# a double deliberately: a decimal-cast intermediate would change the
# quantizer's numerics (decimal rounding != IEEE), and both engines
# evaluate this shape unfused today (verified bit-exact r5). If a
# regeneration ever flips a code, rederive via decimal on BOTH sides.

SQ8_CLIP = 127.0


def abs_max(v: Column) -> Column:
    return F.array_max(F.transform(v, lambda x: F.abs(x)))


def quantize_codes(v: Column, scale: Column) -> Column:
    return F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-SQ8_CLIP),
            F.least(F.lit(SQ8_CLIP), F.floor(x * scale + F.lit(0.5)).cast("double")),
        ),
    )


def duck_abs_max(v_ref: str) -> str:
    return f"list_max(list_transform({v_ref}, x -> abs(x)))"


def duck_quantize(v_ref: str, scale_ref: str) -> str:
    return (
        f"list_transform({v_ref}, x -> greatest(-{SQ8_CLIP}, "
        f"least({SQ8_CLIP}, floor(x * {scale_ref} + 0.5))))"
    )


# DuckDB oracle fragments mirroring the expressions above bit-exactly.
# {a}/{b} are embedding column references (FLOAT[] lists).

def duck_dot(a: str, b: str, dim: int = DIM) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1,{dim}), "
        f"i -> CAST({a}[i] AS DOUBLE)*CAST({b}[i] AS DOUBLE)), (x,y) -> x+y)"
    )


def duck_norm(a: str, dim: int = DIM) -> str:
    return f"sqrt({duck_dot(a, a, dim)})"


def duck_cosine(a: str, b: str, dim: int = DIM) -> str:
    return f"({duck_dot(a, b, dim)} / ({duck_norm(a, dim)} * {duck_norm(b, dim)}))"


def duck_l2(a: str, b: str, dim: int = DIM) -> str:
    return (
        f"sqrt(list_reduce(list_transform(generate_series(1,{dim}), "
        f"i -> (CAST({a}[i] AS DOUBLE)-CAST({b}[i] AS DOUBLE))"
        f"*(CAST({a}[i] AS DOUBLE)-CAST({b}[i] AS DOUBLE))), (x,y) -> x+y))"
    )
