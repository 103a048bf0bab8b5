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


def test_classify_with_dispatch(spark, labeled):
    """R4 strategy dispatch: heuristic == classify(); scored keeps
    structural labels and emits content/noise from the model."""
    from octospark.pipeline import classify_with
    from octospark.scorer import fit_scorer

    blocks = labeled.drop("label")
    heur = classify_with(blocks, "heuristic")
    model = fit_scorer(labeled, epochs=30, max_rows=5_000)
    sc = classify_with(blocks, "scored", model)
    assert set(sc.columns) == set(heur.columns)
    labels = {r.label for r in sc.select("label").distinct().collect()}
    assert labels <= {"content", "noise", "heading", "caption", "table",
                      "boilerplate-nav", "boilerplate-header",
                      "boilerplate-footer", "advert", "unknown"}
    # structural labels identical across strategies
    j = (heur.selectExpr("url", "block_id", "label AS lh")
         .join(sc.selectExpr("url", "block_id", "label AS ls"),
               ["url", "block_id"]))
    # boilerplate-nav excluded: the heuristic also assigns it from
    # link density, which the scored strategy intentionally arbitrates
    structural = ("heading", "caption", "table",
                  "boilerplate-header", "boilerplate-footer", "advert")
    assert j.filter(
        (F.col("lh").isin(*structural)) & (F.col("lh") != F.col("ls"))
    ).count() == 0
    with pytest.raises(ValueError):
        classify_with(blocks, "bogus")
    with pytest.raises(ValueError):
        classify_with(blocks, "scored")


def test_fit_empty_training_frame_clear_error(spark, labeled):
    """An empty (filtered-to-nothing) training frame raises a clear
    ValueError, not a cryptic IndexError from 1-D slicing."""
    with pytest.raises(ValueError, match="no training rows"):
        fit_scorer(labeled.filter(F.lit(False)), epochs=5)


def test_distributed_scorer_partitioning_invariant_and_learns(spark, labeled):
    """The scale path (fit_scorer_distributed) is bit-identical at any
    partitioning and reproduces the heuristic cascade about as well as
    the driver-side trainer does."""
    from octospark.scorer import fit_scorer_distributed, score_expr_distributed
    from pyspark.sql import functions as F

    m1 = fit_scorer_distributed(labeled.coalesce(1), steps=20)
    m2 = fit_scorer_distributed(labeled.repartition(7), steps=20)
    assert m1["weights"] == m2["weights"] and m1["bias"] == m2["bias"]
    assert m1["val_total"] > 0 and m1["val_acc"] >= 0.75
    # inference path stays pure-JVM: scoring agrees with training labels
    from octospark.scorer import _with_context, training_frame

    scored = _with_context(labeled).withColumn(
        "z", score_expr_distributed(m1)
    )
    agree = scored.select(
        (
            (F.col("z") > 0)
            == F.col("label").isin("content", "heading")
        ).cast("int").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    assert agree >= 0.75


def test_resume_from_actually_warm_starts(spark, labeled, tmp_path):
    """Code-review regression: resume_from was accepted but ignored. A
    resumed 1-epoch fit must start from the checkpoint's weights and
    standardization stats, not from zeros."""
    import json

    ckpt = str(tmp_path / "warm")
    m0 = fit_scorer(labeled, epochs=60, checkpoint_dir=ckpt)
    m1 = fit_scorer(
        labeled, epochs=1, resume_from=str(tmp_path / "warm" / "best.json")
    )
    # stats are inherited from the checkpoint, not recomputed
    assert m1["mu"] == m0["mu"] and m1["sigma"] == m0["sigma"]
    # one epoch from the trained weights stays near the checkpoint's
    # quality; one epoch from zeros does not
    cold = fit_scorer(labeled, epochs=1)
    assert m1["val_acc"] >= m0["val_acc"] - 0.05
    assert m1["val_acc"] > cold["val_acc"]
    assert m0["val_is_train_fallback"] is False


def test_distributed_checkpoint_roundtrips_full_model(spark, labeled, tmp_path):
    """Code-review regression: the distributed checkpoint previously
    dropped features/quantize_unit, so a reloaded model crashed
    score_blocks (or silently warm-started in the wrong feature
    space). The persisted file must round-trip the FULL model."""
    from octospark.scorer import (
        fit_scorer_distributed,
        load_model,
        score_blocks,
    )

    ckpt = str(tmp_path / "dist_ckpt")
    m = fit_scorer_distributed(labeled, steps=5, checkpoint_dir=ckpt)
    reloaded = load_model(f"{ckpt}/best_distributed.json")
    assert reloaded["features"] == list(m["features"])
    assert reloaded["quantize_unit"] == m["quantize_unit"]
    scored = score_blocks(labeled, reloaded)
    assert scored.filter(F.col("scored_label").isNull()).count() == 0
