"""Python UDTFs (Spark 3.5+/4 table-function API): SQL-surface
wrappers over engine capabilities, so ``spark.sql`` users get table
functions without touching the DataFrame API.

Python executes per row here BY DESIGN LIMITATION of the UDTF API —
these are the SQL convenience surface, not the hot path: the
pipeline-grade equivalents stay fully codegen'd
(``functions.text.word_shingles`` for n-grams).  Register with
``register_udtfs(spark)``; then::

    SELECT t.doc_id, g.pos, g.ngram
    FROM documents t, LATERAL word_ngrams(t.text, 2) g
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string")
class WordNgrams:
    """Positional word n-grams of lowercased whitespace-split text
    (NON-distinct, in order — the sequence form; the set form is
    ``word_shingles``)."""

    def eval(self, text: str, n: int):  # noqa: D102
        toks = [t for t in (text or "").lower().split() if t]
        if n <= 0:
            return
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


@udtf(returnType="split string, lo double, hi double")
class HashSplitBounds:
    """The md5-threshold split boundaries as a tiny lookup table —
    the documentation-as-data companion to the corpus splits."""

    def eval(self, train_frac: float, val_frac: float):  # noqa: D102
        yield "train", 0.0, float(train_frac)
        yield "val", float(train_frac), float(train_frac + val_frac)
        yield "test", float(train_frac + val_frac), 1.0


def register_udtfs(spark) -> None:
    """Register every UDTF with the session (idempotent)."""
    spark.udtf.register("word_ngrams", WordNgrams)
    spark.udtf.register("hash_split_bounds", HashSplitBounds)
