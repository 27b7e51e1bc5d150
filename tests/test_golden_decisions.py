"""M5 exit criterion: the engine independently reproduces the pinned
reference decisions (keep/drop + drop_reason + A/B/C labels + scrubbed
transcript) at per-subtask macro-F1 ≥ 0.99 (BASELINE.json:2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_task_offensive_language_detection_spark.operators.metrics import macro_f1_value
from multi_task_offensive_language_detection_spark.plans.pipeline import score_transcripts
from multi_task_offensive_language_detection_spark.sources.clips import read_clips


@pytest.fixture(scope="module")
def joined(spark, artifacts, clips_fixture):
    clips_dir, golden_path = clips_fixture
    clips = read_clips(spark, clips_dir).select("clip_id", "dur_ms", "transcript", "part_id")
    scored = score_transcripts(clips, "transcript", artifacts, dur_ms_col="dur_ms")
    golden = spark.read.parquet(golden_path)
    j = scored.alias("e").join(golden.alias("g"), "clip_id", "inner").cache()
    assert j.count() == 2000
    return j


def test_keep_decision_exact(joined):
    mism = joined.filter(F.col("e.keep") != F.col("g.keep"))
    rows = mism.select("clip_id", "g.stratum", "transcript", "e.drop_reason", "g.drop_reason", "e.ppl").collect()
    assert not rows, f"{len(rows)} keep mismatches, e.g. {rows[:5]}"


def test_drop_reason_exact(joined):
    mism = joined.filter(
        ~(
            (F.col("e.drop_reason") == F.col("g.drop_reason"))
            | (F.col("e.drop_reason").isNull() & F.col("g.drop_reason").isNull())
        )
    )
    rows = mism.select("clip_id", "g.stratum", "transcript", "e.drop_reason", "g.drop_reason").collect()
    assert not rows, f"{len(rows)} drop_reason mismatches, e.g. {rows[:5]}"


@pytest.mark.parametrize("level", ["label_a", "label_b", "label_c"])
def test_subtask_macro_f1(joined, level):
    # hierarchy: evaluate only rows the GOLD labels at that level (the
    # reference's masked-loss convention, SURVEY.md §3.1 step 3)
    d = joined.filter(F.col(f"g.{level}").isNotNull()).select(
        F.col(f"g.{level}").alias("gold"), F.col(f"e.{level}").alias("pred")
    )
    f1 = macro_f1_value(d.fillna("MISSING", subset=["pred"]))
    assert f1 >= 0.99, f"{level} macro-F1 {f1:.4f} < 0.99"


def test_scrubbed_transcript_golden(joined):
    mism = joined.filter(F.col("e.scrubbed_transcript") != F.col("g.scrubbed_transcript"))
    rows = mism.select("transcript", "e.scrubbed_transcript", "g.scrubbed_transcript").collect()
    assert not rows, f"{len(rows)} scrub mismatches, e.g. {rows[:3]}"


def test_kept_clean_rows_transcript_equality(joined):
    """BASELINE.json:15 invariant: kept rows with no scrub edits pass
    through byte-identical."""
    bad = joined.filter(
        F.col("e.keep") & (F.col("g.n_edits") == 0)
        & (F.col("e.scrubbed_transcript") != F.col("transcript"))
    )
    assert bad.count() == 0


def test_hierarchy_invariant(joined):
    assert joined.filter((F.col("e.label_a") == "NOT") & F.col("e.label_b").isNotNull()).count() == 0
    assert joined.filter((F.col("e.label_b") != "TIN") & F.col("e.label_c").isNotNull()).count() == 0
    assert joined.filter((F.col("e.label_a") == "OFF") & F.col("e.label_b").isNull()).count() == 0
