"""Inference/eval lifecycle (SURVEY.md §3.2 — reference entry point 2):
score → join gold on id (broadcast: gold files are small) → accuracy /
per-class F1 / macro-F1 → id-sorted submission CSV."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import metrics
from ..sources.sinks import write_submission_csv


def evaluate_predictions(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_col: str = "pred",
    gold_col: str = "label",
) -> dict:
    """J2 + A3-A6: returns {'accuracy', 'macro_f1', 'per_class': {...}}.

    The join broadcasts the gold side (official label files are hundreds
    of rows; the prediction side can be any size)."""
    j = pred.join(F.broadcast(gold), id_col, "inner").select(
        F.col(gold_col).alias("gold"), F.col(pred_col).alias("pred")
    )
    acc = metrics.accuracy(j).collect()[0]["accuracy"]
    per = {r["cls"]: r["f1"] for r in metrics.f1_per_class(j).collect()}
    return {
        "accuracy": acc,
        "macro_f1": sum(per.values()) / len(per) if per else 0.0,
        "per_class": per,
    }


def emit_submission(pred: DataFrame, path: str, id_col: str = "id", pred_col: str = "pred") -> None:
    """O1 + S6 — the official submission format."""
    write_submission_csv(pred, path, id_col=id_col, label_col=pred_col)
