"""Scorer (train-command analog) tests: deterministic fit, top-k
checkpoints, resume, JVM-only inference, and agreement with the
heuristic classifier it distills."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from octospark.scorer import (
    fit_scorer,
    load_model,
    score_blocks,
)


@pytest.fixture(scope="module")
def labeled(spark, pages):
    from octospark.pipeline import classify, segment

    df = classify(segment(pages)).cache()
    df.count()
    return df


def test_fit_deterministic(spark, labeled):
    m1 = fit_scorer(labeled, epochs=60)
    m2 = fit_scorer(labeled, epochs=60)
    assert m1["weights"] == m2["weights"]
    assert m1["val_acc"] == m2["val_acc"]


def test_fit_distills_heuristic(spark, labeled):
    model = fit_scorer(labeled, epochs=200)
    # the linear scorer should reproduce the rule cascade reasonably
    assert model["val_acc"] > 0.9
    scored = score_blocks(labeled, model)
    agree = scored.withColumn(
        "heur", F.col("label").isin("content", "heading").cast("int")
    ).withColumn(
        "pred", (F.col("scored_label") == "content").cast("int")
    )
    acc = agree.agg(
        F.avg((F.col("heur") == F.col("pred")).cast("double"))
    ).collect()[0][0]
    assert acc > 0.9


def test_checkpoints_and_resume(spark, labeled, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    model = fit_scorer(labeled, epochs=60, checkpoint_dir=ckpt)
    files = os.listdir(ckpt)
    assert "best.json" in files
    assert any(f.startswith("epoch") for f in files)
    loaded = load_model(os.path.join(ckpt, "best.json"))
    assert loaded["weights"] == model["weights"]
    with open(os.path.join(ckpt, "best.json")) as f:
        assert json.load(f)["seed"] == 42


def test_inference_is_jvm_only(spark, labeled):
    model = fit_scorer(labeled, epochs=30)
    scored = score_blocks(labeled.limit(100), model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # scoring adds no Python eval nodes — the score is a Project expr
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    head = plan.split("MapInPandas")[0]  # everything above the segmenter
    assert "score" in head and "Project" in head
    assert scored.filter(F.col("scored_label").isNull()).count() == 0
