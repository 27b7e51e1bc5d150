"""Reference lifecycle parity (SURVEY.md §3.1-3.3): TSV scans, hierarchy
filters, distant-label minting + union, hash-mod split, eval + submission.
Fixture TSV/CSV files are written in the reference's exact formats."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from multi_task_offensive_language_detection_spark.plans import distant, evaluate
from multi_task_offensive_language_detection_spark.sources import olid


@pytest.fixture(scope="module")
def olid_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("olidfiles")
    train = d / "olid-training-v1.0.tsv"
    train.write_text(
        "id\ttweet\tsubtask_a\tsubtask_b\tsubtask_c\n"
        "1\tthe morning light came through\tNOT\tNULL\tNULL\n"
        "2\t@u1 you are a complete idiot\tOFF\tTIN\tIND\n"
        "3\twhat a stupid mess this is\tOFF\tUNT\tNULL\n"
        "4\tthose fans are idiots\tOFF\tTIN\tGRP\n"
    )
    test = d / "testset-levela.tsv"
    test.write_text("id\ttweet\n10\tclean text here\n11\tyou stupid clown\n")
    labels = d / "labels-levela.csv"
    labels.write_text("10,NOT\n11,OFF\n")
    dist = d / "task_a_distant.tsv"
    dist.write_text(
        "id\ttext\taverage\tstd\n"
        "100\tawful stupid garbage\t0.91\t0.10\n"  # confident OFF
        "101\ta calm walk by the river\t0.08\t0.05\n"  # confident NOT
        "102\tborderline text\t0.55\t0.20\n"  # dropped (ambiguous)
        "103\tnoisy text\t0.95\t0.60\n"  # dropped (high std)
    )
    return str(train), str(test), str(labels), str(dist)


def test_read_olid_train_nulls(spark, olid_files):
    train, *_ = olid_files
    df = olid.read_olid_train(spark, train)
    assert df.count() == 4
    r1 = df.filter(F.col("id") == 1).collect()[0]
    assert r1["subtask_b"] is None and r1["subtask_c"] is None
    # hierarchy invariants hold in the data
    assert df.filter((F.col("subtask_a") == "NOT") & F.col("subtask_b").isNotNull()).count() == 0


def test_distant_minting_and_union(spark, olid_files):
    train, _, _, dist = olid_files
    d = olid.read_solid_distant(spark, dist)
    minted = distant.mint_distant_labels(d)
    got = {r["id"]: r["subtask_a"] for r in minted.collect()}
    assert got == {100: "OFF", 101: "NOT"}  # ambiguous + noisy dropped
    merged = distant.union_training_sets(olid.read_olid_train(spark, train), minted)
    assert merged.count() == 6
    # null B labels: train id1 (NOT) + the two silver rows
    assert merged.filter(F.col("subtask_b").isNull()).count() == 3


def test_hash_mod_split_deterministic(spark):
    df = spark.range(1000).withColumnRenamed("id", "id")
    tr1, dev1 = distant.hash_mod_split(df)
    tr2, dev2 = distant.hash_mod_split(df)
    assert tr1.count() == tr2.count() and dev1.count() == dev2.count()
    assert tr1.count() + dev1.count() == 1000
    assert 700 < tr1.count() < 900  # ~80%
    assert tr1.intersect(dev1).count() == 0


def test_eval_and_submission(spark, olid_files, tmp_path):
    _, test_tsv, labels_csv, _ = olid_files
    tweets = olid.read_olid_test(spark, test_tsv)
    gold = olid.read_gold_labels(spark, labels_csv)
    # predict with the engine's taxonomy head over normalized text
    from multi_task_offensive_language_detection_spark.functions.scrub import scrub_pii
    from multi_task_offensive_language_detection_spark.functions.text import normalize_ws
    from multi_task_offensive_language_detection_spark.operators import taxonomy

    norm = normalize_ws(scrub_pii(F.lower(F.col("tweet"))))
    pred = taxonomy.with_labels(tweets.withColumn("norm_text", norm)).select(
        "id", F.col("label_a").alias("pred")
    )
    rep = evaluate.evaluate_predictions(pred, gold)
    assert rep["accuracy"] == 1.0 and rep["macro_f1"] == 1.0

    out = str(tmp_path / "submission")
    evaluate.emit_submission(pred, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    lines = open(os.path.join(out, files[0])).read().strip().splitlines()
    assert lines == ["10,NOT", "11,OFF"]
