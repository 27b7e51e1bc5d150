"""Python UDTFs (Spark 4 table functions) — X3's genuine UDTF surface.

``explode(split(...))`` covers array explosion natively and stays the
right tool for it; a Python UDTF earns its keep when the row expansion
carries LOGIC a SQL expression can't: stateful-within-row parses,
variable-arity emissions, early termination. ``SentenceSplit`` keeps
the logic deliberately SQL-mirrorable (split on '. ') so the driver
oracle can verify the UDTF MACHINERY — registration, lateral
correlation, ordinality, NULL-row skip — end to end; swap the split
for a real segmenter and the plumbing stays identical.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="idx int, sentence string")
class SentenceSplit:
    """text → one row per '. '-separated sentence with its index.
    NULL texts emit no rows (the lateral join drops them), matching
    unnest-of-NULL semantics in ANSI engines."""

    def eval(self, text: str):  # noqa: D102 - contract is the class doc
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            yield i, s


def register_all(spark) -> None:
    spark.udtf.register("sentence_split", SentenceSplit)
