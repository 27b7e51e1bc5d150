"""Corpus-mixing curation ops (operators/quality.py): deterministic
stratified sampling to a target domain mixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_task_offensive_language_detection_spark.operators.quality import (
    sample_to_mixture,
)


@pytest.fixture(scope="module")
def domains(spark):
    # 3 domains with very different populations: web 10k, code 2k, wiki 500
    rows = (
        [(i, "web") for i in range(10_000)]
        + [(i + 10_000, "code") for i in range(2_000)]
        + [(i + 12_000, "wiki") for i in range(500)]
    )
    return spark.createDataFrame(rows, "doc_id long, domain string").cache()


def test_mixture_proportions_and_caps(domains):
    # target 50/30/20 over 3000 rows -> web 1500, code 900, wiki 600 (caps at 500)
    out = sample_to_mixture(
        domains, "domain", "doc_id", {"web": 0.5, "code": 0.3, "wiki": 0.2}, 3000
    )
    got = {r["domain"]: r["n"] for r in out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    # hash-mod sampling: binomial-ish tolerance ~4 sigma
    assert abs(got["web"] - 1500) < 150
    assert abs(got["code"] - 900) < 120
    assert got["wiki"] == 500  # undersupplied domain keeps everything


def test_mixture_deterministic_and_seed_switchable(domains):
    w = {"web": 0.5, "code": 0.5}
    a = {r["doc_id"] for r in sample_to_mixture(domains, "domain", "doc_id", w, 2000).collect()}
    b = {r["doc_id"] for r in sample_to_mixture(domains, "domain", "doc_id", w, 2000).collect()}
    assert a == b  # same seed -> exactly the same rows (retry-safe)
    c = {r["doc_id"] for r in sample_to_mixture(domains, "domain", "doc_id", w, 2000, seed=7).collect()}
    assert a != c  # different seed -> different sample


def test_mixture_drops_unlisted_domains(domains):
    out = sample_to_mixture(domains, "domain", "doc_id", {"code": 1.0}, 1000)
    assert out.select("domain").distinct().collect()[0]["domain"] == "code"


def test_mixture_rejects_bad_weights(domains):
    with pytest.raises(ValueError, match="positive"):
        sample_to_mixture(domains, "domain", "doc_id", {"web": 0.0}, 100)
