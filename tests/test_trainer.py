"""Laws for the distributed exact trainer (octospark/trainer.py):

1. bit-identical weights at ANY partitioning (the decimal fixed-point
   gradient makes the float-sum-order problem structurally impossible);
2. bit-identical agreement with a pure-Python replica of the same loop
   (every op is either exact integer or correctly-rounded IEEE double,
   so three engines — JVM, Python, DuckDB — must agree bitwise; the
   DuckDB leg is the train_quality_classifier oracle);
3. the trained classifier actually learns (beats majority class);
4. empty training split fails loudly.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from octospark.trainer import SCALE, fit_logistic_exact

FEATS = ["f1", "f2", "f3"]


def _frame(spark):
    # deterministic integer features with a learnable-but-noisy rule
    return spark.range(600).select(
        (F.col("id") % 97).alias("f1"),
        ((F.col("id") * 17) % 53).alias("f2"),
        ((F.col("id") * 29) % 31).alias("f3"),
        (((F.col("id") % 97) * 2 + (F.col("id") * 17) % 53 > 120))
        .cast("long")
        .alias("y"),
        ((F.col("id") % 10) < 8).alias("is_train"),
    )


def _rows(spark):
    return [
        (int(r.f1), int(r.f2), int(r.f3), int(r.y), bool(r.is_train))
        for r in _frame(spark).collect()
    ]


def _fit_python(rows, steps=4, lr=0.25):
    """Pure-Python replica with the IDENTICAL op sequence as
    fit_logistic_exact — exact integer sums, left-fold z, rational
    sigmoid, floor-quantized gradients."""
    tr = [r for r in rows if r[4]]
    n = len(tr)
    nf = float(n)
    k = len(FEATS)
    mu, sg = [], []
    for j in range(k):
        s = sum(r[j] for r in tr)  # exact int
        q = sum(r[j] * r[j] for r in tr)
        m = float(s) / nf
        v = float(q) / nf - m * m
        mu.append(m)
        sg.append(math.sqrt(v) if v > 0.0 else 1.0)
    w = [0.0] * k
    b = 0.0
    for _ in range(steps):
        g = [0] * k
        gb = 0
        for r in tr:
            x = [(float(r[j]) - mu[j]) / sg[j] for j in range(k)]
            z = b
            for j in range(k):
                z = z + w[j] * x[j]
            p = 0.5 + z / (2.0 * (1.0 + abs(z)))
            yd = float(r[3])
            for j in range(k):
                g[j] += math.floor(((p - yd) * x[j]) * SCALE)
            gb += math.floor((p - yd) * SCALE)
        for j in range(k):
            w[j] = w[j] - lr * ((float(g[j]) / SCALE) / nf)
        b = b - lr * ((float(gb) / SCALE) / nf)
    return w, b, mu, sg


def test_bitwise_invariant_to_partitioning(spark):
    df = _frame(spark)
    m1 = fit_logistic_exact(df.coalesce(1), FEATS)
    m13 = fit_logistic_exact(df.repartition(13), FEATS)
    assert m1["weights"] == m13["weights"]  # EXACT, not approx
    assert m1["bias"] == m13["bias"]
    assert m1["val_correct"] == m13["val_correct"]


def test_bitwise_matches_pure_python_replica(spark):
    m = fit_logistic_exact(_frame(spark), FEATS)
    w, b, mu, sg = _fit_python(_rows(spark))
    assert m["weights"] == w and m["bias"] == b
    assert m["mu"] == mu and m["sigma"] == sg


def test_learns_beyond_majority_class(spark):
    df = _frame(spark)
    m = fit_logistic_exact(df, FEATS, steps=12)
    val = [r for r in _rows(spark) if not r[4]]
    majority = max(
        sum(1 for r in val if r[3] == 1), sum(1 for r in val if r[3] == 0)
    )
    assert m["val_total"] == len(val)
    assert m["val_correct"] > majority


def test_empty_train_split_raises(spark):
    df = _frame(spark).withColumn("is_train", F.lit(False))
    with pytest.raises(ValueError, match="no training rows"):
        fit_logistic_exact(df, FEATS)


def test_quality_key_output_invariants(spark):
    from octospark.textops import QUERIES

    row = QUERIES["train_quality_classifier"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    total = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert row.n_train + row.val_total == total
    assert 0 <= row.val_correct <= row.val_total
    assert all(
        isinstance(row[c], float) for c in ("w1", "w2", "w3", "w4", "w5")
    )


def test_constant_feature_uses_unit_sigma_not_nan(spark):
    """A constant feature (variance 0) must hit the sigma=1.0 guard on
    both engines' op sequence — weights stay finite and the constant
    feature's standardized value is a harmless constant."""
    df = spark.range(200).select(
        (F.col("id") % 13).alias("f1"),
        F.lit(7).alias("f2"),  # constant
        ((F.col("id") % 13) > 6).cast("long").alias("y"),
        ((F.col("id") % 10) < 8).alias("is_train"),
    )
    m = fit_logistic_exact(df, ["f1", "f2"], steps=6)
    assert m["sigma"][1] == 1.0
    assert all(math.isfinite(x) for x in m["weights"] + [m["bias"]])
    assert m["val_correct"] > m["val_total"] // 2


def test_property_bitwise_replica_on_random_frames(spark):
    """Hypothesis generalization of the bitwise-replica law: for random
    integer feature frames (including degenerate labels and constant
    columns), the distributed trainer equals the pure-Python loop
    EXACTLY — weights, bias, mu, sigma. Few examples because each draw
    is a real Spark fit; the fixed-frame tests carry the fast path."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows_st = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=-500, max_value=500),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=5,
        max_size=60,
    )

    @settings(max_examples=6, deadline=None)
    @given(rows_st)
    def law(raw):
        rows = [
            (f1, f2, 0, y, i % 4 != 3)  # f3 constant: sigma guard path
            for i, (f1, f2, y) in enumerate(raw)
        ]
        if not any(r[4] for r in rows):
            return
        df = spark.createDataFrame(
            rows, "f1 long, f2 long, f3 long, y long, is_train boolean"
        )
        m = fit_logistic_exact(df.repartition(5), FEATS, steps=3)
        w, b, mu, sg = _fit_python(rows, steps=3)
        assert m["weights"] == w and m["bias"] == b
        assert m["mu"] == mu and m["sigma"] == sg

    law()
