"""Python user-defined TABLE functions (Spark 4 `@udtf`) — the API
surface for per-row set-returning logic in SQL `LATERAL` position.

One production note baked into the design: a UDTF is Python per row
(Arrow-batched here via `useArrow=True`, but still the slow path) — the
library's hot n-gram paths stay JVM-side (`F.transform`/`posexplode`,
see operators/text.py). The registered gate query exists to pin the
UDTF machinery itself against a hard SQL oracle, so a user extending
the engine with custom table functions inherits a tested template.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

__all__ = ["WordNGrams", "register_udtfs", "udtf_ngram_stats"]


@udtf(returnType="pos int, gram string", useArrow=True)
class WordNGrams:
    """LATERAL word n-grams: (position, gram) per input row."""

    def eval(self, text: str, n: int):
        if text is None or n is None or n < 1:
            return
        toks = text.split(" ")
        for i in range(max(0, len(toks) - n + 1)):
            yield i, " ".join(toks[i:i + n])


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("word_ngrams", WordNGrams)


def udtf_ngram_stats(spark: SparkSession, docs: DataFrame, n: int = 2,
                     text_col: str = "text",
                     lang_col: str = "lang") -> DataFrame:
    """Per-language n-gram totals computed through the UDTF lateral
    join (gram production in Python/Arrow; aggregation in the JVM)."""
    register_udtfs(spark)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(f"""
        SELECT {lang_col} AS lang,
               COUNT(*) AS n_grams,
               COUNT(DISTINCT g.gram) AS n_distinct,
               CAST(SUM(g.pos) AS BIGINT) AS pos_checksum
        FROM _udtf_docs, LATERAL word_ngrams({text_col}, {int(n)}) AS g
        GROUP BY {lang_col}
        ORDER BY lang""")
