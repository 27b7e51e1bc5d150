"""Hierarchical OLID subtask A/B/C labeling (SURVEY.md P3, M5).

The reference's three BERT heads ([R] ref:models.py; Dai et al. 2020,
arXiv:2004.13432) become three nested when-chains over lexicon signals —
the graft's "heuristic rule head". The OLID hierarchy invariant is
structural here, not post-hoc: B is only computed where A=OFF, C only
where B=TIN (Zampieri et al. 2019, arXiv:1902.09666).

    A: OFF  ⇔ any profanity-lexicon token present
    B: TIN  ⇔ OFF and a targeting signal (2nd person / @USER / group noun
              / entity noun); else UNT
    C: IND  ⇔ 2nd-person or @USER target
       GRP  ⇔ group-noun target
       OTH  ⇔ entity-noun target

Inputs must be normalized text (lowercased, @mentions→@USER).
Pure Column expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_flag
from ..lexicons import ENTITY_NOUNS, GROUP_NOUNS, PROFANITY, SECOND_PERSON


def signals(norm_text: Column) -> dict[str, Column]:
    """The four boolean lexicon signals (each one compiled JVM regex)."""
    return {
        "profane": word_flag(norm_text, PROFANITY),
        # masked mentions appear as @USER (case-preserving paths) or @user
        # (lowercased norm_text) — accept both spellings
        "second_person": word_flag(norm_text, SECOND_PERSON)
        | norm_text.contains("@USER")
        | norm_text.contains("@user"),
        "group": word_flag(norm_text, GROUP_NOUNS),
        "entity": word_flag(norm_text, ENTITY_NOUNS),
    }


def label_a(sig: dict[str, Column]) -> Column:
    return F.when(sig["profane"], F.lit("OFF")).otherwise(F.lit("NOT"))


def label_b(a: Column, sig: dict[str, Column]) -> Column:
    targeted = sig["second_person"] | sig["group"] | sig["entity"]
    return F.when(
        a == "OFF", F.when(targeted, F.lit("TIN")).otherwise(F.lit("UNT"))
    ).otherwise(F.lit(None).cast("string"))


def label_c(b: Column, sig: dict[str, Column]) -> Column:
    # priority IND > GRP > OTH (pinned decision order)
    return F.when(
        b == "TIN",
        F.when(sig["second_person"], F.lit("IND"))
        .when(sig["group"], F.lit("GRP"))
        .otherwise(F.lit("OTH")),
    ).otherwise(F.lit(None).cast("string"))


def with_labels(
    df: DataFrame,
    norm_col: str = "norm_text",
    profane: Column | None = None,
    second_person: Column | None = None,
    group: Column | None = None,
    entity: Column | None = None,
) -> DataFrame:
    """Attach label_a/label_b/label_c preserving the hierarchy invariant.

    The optional columns let the caller reuse already-computed signals:
    the pipeline gets all four from the fused Arrow scoring stage
    (operators/scoring.py sig bitmask), so no JVM alternation scan runs
    here at all — and ``norm_col`` need not even exist then; standalone
    callers fall back to the regex signals over ``norm_col``."""
    overrides = {
        "profane": profane,
        "second_person": second_person,
        "group": group,
        "entity": entity,
    }
    if all(v is not None for v in overrides.values()):
        sig = overrides
    else:
        sig = signals(F.col(norm_col))
        sig.update({k: v for k, v in overrides.items() if v is not None})
    a = label_a(sig)
    b = label_b(a, sig)
    c = label_c(b, sig)
    return df.withColumns({"label_a": a, "label_b": b, "label_c": c})
