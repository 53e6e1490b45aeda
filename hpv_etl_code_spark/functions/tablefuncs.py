"""User-defined table functions (SURVEY §2.10: Spark ≥3.5 ``udtf``).

One worked example — ``explode_ngrams`` — showing the registration and
lateral-join usage pattern for row→rows expansion that needs imperative
logic. For anything expressible with explode/transform, prefer native
Columns (see operators/textops.py); UDTFs run in Python workers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="ngram: string, pos: int")
class ExplodeNgrams:
    """Yield word n-grams of a text with their positions."""

    def eval(self, text: str, n: int):  # noqa: ANN001
        if not text:
            return
        toks = text.split(" ")
        for i in range(max(len(toks) - n + 1, 0)):
            yield ("_".join(toks[i : i + n]), i)


def register_table_functions(spark: SparkSession) -> None:
    """Make the UDTFs callable from SQL (LATERAL / table-function syntax)."""
    spark.udtf.register("explode_ngrams", ExplodeNgrams)
