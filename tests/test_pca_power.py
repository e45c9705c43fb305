"""Power-iteration PCA: exact-integer replication (formulation pin)
plus CONVERGENCE on a planted anisotropic corpus — the property the
cross-engine oracle cannot see (it proves both engines run the same
arithmetic, not that the arithmetic finds the principal direction)."""

from __future__ import annotations

import math

import numpy as np

from hive_similarity_join_spark.queries.vectors_q import (
    PCA_SCALE,
    PCA_VSCALE,
    pca_power_direction,
)
from hive_similarity_join_spark.registry import QUERIES, load_registry
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE

load_registry()


def _direction(df):
    rows = sorted(df.collect(), key=lambda r: r.dim)
    return np.array([int(r.v) for r in rows], dtype=object)


def _brute(X: np.ndarray, rounds: int) -> np.ndarray:
    """The fixed-point recursion in arbitrary-precision Python ints."""
    xi = np.floor(X.astype(np.float64) * PCA_SCALE).astype(np.int64)
    n, d = xi.shape
    y = (n * xi - xi.sum(axis=0, keepdims=True)).astype(object)
    v = np.full(d, PCA_VSCALE, dtype=object)
    for _ in range(rounds):
        dp = y @ v
        w = y.T @ dp
        mx = max(abs(int(c)) for c in w)

        def truncdiv(num: int) -> int:
            # both engines truncate integer division toward zero;
            # Python's // floors, so divide magnitudes and restore sign
            q = abs(num) // mx
            return q if num >= 0 else -q

        v = np.array(
            [truncdiv(int(c) * PCA_VSCALE) for c in w], dtype=object
        )
    return v


def test_operator_matches_bigint_recursion(spark):
    got = _direction(QUERIES["q_vec_pca_power"](spark, SF_SMOKE))
    X = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .orderBy("vec_id")
            .collect()
        ]
    )
    want = _brute(X, rounds=3)
    assert [int(a) for a in got] == [int(b) for b in want]


def test_converges_on_planted_direction(spark):
    rng = np.random.default_rng(7)
    d = 16
    true = rng.normal(size=d)
    true /= np.linalg.norm(true)
    a = rng.normal(scale=5.0, size=(300, 1))
    X = a * true + rng.normal(scale=0.05, size=(300, d))
    X = X / (np.abs(X).max() * 1.05)  # inside the quantization range
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id: long, embedding: array<double>",
    )
    v = _direction(pca_power_direction(df, rounds=3)).astype(float)
    Xc = X - X.mean(0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc)
    assert evals[-1] / evals[-2] > 100  # the plant really is dominant
    cos = abs(float(v @ evecs[:, -1]) / np.linalg.norm(v))
    assert cos > 0.999, cos
    assert math.isfinite(cos)
