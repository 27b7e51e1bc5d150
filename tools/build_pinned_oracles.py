"""Pin the two remaining convertible rows-only driver keys to fixture
oracles (VERDICT r4 #5), following the flagship-fixture pattern
(tools/build_flagship_fixture.py): run the engine kernel ONCE per
testdata scale factor, pin its outputs into a committed parquet keyed
by an arithmetic corpus signature both engines compute exactly, and
let one static oracle SQL string pick the right slice at runtime.

- ``hashtag_segments.parquet`` (corpus_sig, doc_id, tag, segmented):
  the greedy longest-match dictionary segmentation of the check's
  synthetic hashtags. corpus_sig = sum(doc_id * n_chars) over
  documents — same key as the flagship fixture. Independence: besides
  the engine-pinned slices (tag NULL), the fixture carries
  HANDWRITTEN rows at corpus_sig = -1 whose segmentations were
  derived by hand from the documented greedy semantics + the vocab
  list (NEVER regenerated from the engine — see _HANDWRITTEN below);
  tests/test_text_ops.py checks the live segmenter against them, so a
  semantics-drifting regeneration cannot silently re-pin itself.

- ``pca_projections.parquet`` (corpus_sig, vec_id, pc0..pc3): the k=4
  PCA projection of the embeddings table, rounded to 4 decimals (the
  float-sum order across partitions is run-dependent at the 1e-12
  level; 4 decimals leaves ~1e-8 boundary-flip odds per value while
  any real kernel bug moves values by far more). corpus_sig =
  sum(vec_id * floor(embedding[0] * 1000)) — embeddings tables collide
  on count across sfs, and float*1000→floor is exact integer arithmetic
  in both engines (24-bit float mantissa scaled in double).
  Independence guard: tests/test_linalg.py proves pca_fit against a
  from-scratch numpy reference; the fixture drift test compares the
  committed values to that same independent reference directly.

Regenerate after any hashtag-vocab or PCA kernel change:

    python tools/build_pinned_oracles.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = os.path.join(REPO, "tests", "fixtures", "data")
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


# Engine-INDEPENDENT goldens: (input text, expected segmentation), written
# BY HAND from the documented semantics (CamelCase split first; lowercase
# runs greedy longest-prefix over the LM vocab; unmatched chars accrete)
# plus membership/junction checks against the vocab LIST (data, not the
# segmenter). Junction safety was verified by hand: no vocab word longer
# than the intended first word is a prefix of any concatenated run here.
# DO NOT regenerate these from the engine — their whole point is to fail
# if a buggy segmenter change tries to re-pin itself via a rebuild.
_HANDWRITTEN: list[tuple[str, str]] = [
    ("hello #TheHouse and #thepeoplesaid ok", "hello the house and the people said ok"),
    ("#GoodMorning", "good morning"),
    ("#Spark2024Rocks", "spark 2024 rocks"),  # CamelCase+digits: no dict needed
    ("#THEHOUSE", "thehouse"),  # all-caps run is ONE piece, never dict-split
    ("#qqqzzz end", "qqqzzz end"),  # unknown chars accrete, never vanish
    ("no tags here", "no tags here"),
    ("#goodday", "good day"),
    ("#seeyou", "see you"),
    ("#aguaall", "agua all"),  # non-ASCII vocab word at a junction
    ("#xxthehouse", "xx the house"),  # unknown prefix then greedy matches
    ("#time2go", "time 2 go"),  # digits split the runs before the dict
    ("#good #morning", "good morning"),  # every tag in the text is segmented
    ("#thexxhouse", "the xx house"),  # unknown chunk between matches
    ("plain # sign stays", "plain # sign stays"),  # bare '#' is not a tag
]


def build(spark=None, sf_dirs=None) -> None:
    from pyspark.sql import functions as F

    from multi_task_offensive_language_detection_spark.operators.hashtag import (
        segment_hashtags,
        synth_hashtags_col,
    )
    from multi_task_offensive_language_detection_spark.operators.linalg import (
        embeddings_sig_agg,
        pca_fit,
        pca_project,
    )
    from multi_task_offensive_language_detection_spark.session import build_session

    own = spark is None
    if own:
        spark = build_session(app_name="pinned-oracles", master="local[8]")

    ht_parts, pca_parts = [], []
    for sf in sf_dirs or SF_DIRS:
        d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        sig = int(d.agg(F.sum(F.col("doc_id") * F.col("n_chars"))).collect()[0][0])
        ht_parts.append(
            d.select(
                F.lit(sig).alias("corpus_sig"),
                "doc_id",
                F.lit(None).cast("string").alias("tag"),
                segment_hashtags(synth_hashtags_col()).alias("segmented"),
            )
        )

        raw_e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        e = raw_e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        esig = int(raw_e.agg(embeddings_sig_agg()).collect()[0][0])
        model = pca_fit(e, "embedding", k=4)
        pca_parts.append(
            pca_project(e, "embedding", model).select(
                F.lit(esig).alias("corpus_sig"),
                "vec_id",
                *[F.round(F.col("pca")[j], 4).alias(f"pc{j}") for j in range(4)],
            )
        )

    os.makedirs(DATA_DIR, exist_ok=True)
    import pandas as pd

    hand = pd.DataFrame(
        {
            "corpus_sig": [-1] * len(_HANDWRITTEN),
            "doc_id": [-(i + 1) for i in range(len(_HANDWRITTEN))],
            "tag": [t for t, _ in _HANDWRITTEN],
            "segmented": [s for _, s in _HANDWRITTEN],
        }
    )
    for name, parts, keys, extra in (
        ("hashtag_segments.parquet", ht_parts, ["corpus_sig", "doc_id"], hand),
        ("pca_projections.parquet", pca_parts, ["corpus_sig", "vec_id"], None),
    ):
        allp = parts[0]
        for p in parts[1:]:
            allp = allp.unionByName(p)
        pdf = allp.toPandas()
        if extra is not None:
            pdf = pd.concat([extra, pdf], ignore_index=True)
        pdf = pdf.sort_values(keys).reset_index(drop=True)
        out = os.path.join(DATA_DIR, name)
        pdf.to_parquet(out, index=False)
        print(f"wrote {out}: {len(pdf)} rows")

    if own:
        spark.stop()


if __name__ == "__main__":
    build()
