"""Scale-safe global-ranking twins — round-5 additions.

The repo keeps two documented single-reducer window demos
(``window_ntile_percent``, ``layout_zorder_cluster``'s check path) because
they cover the SQL surface the reference delegates to DuckDB
(``main.cc:181-182``). This module adds the PRODUCTION twin for the NTILE
demo: the same quartile assignment computed with no global sort at all —
the distinct-value-histogram + cumulative-offset mechanism already used by
``inference_ext.quantile_normalize`` (inference_ext.py:355-367) and the
decile-lift family.

Mechanism: global rank r of a row = (rows with a strictly smaller sort-key
value) + (row_number within its own value group). The first term is a
cumulative sum over the VALUE HISTOGRAM (an aggregate, key-cardinality-
sized — never the raw fact stream); the second is a PARTITIONED window
(parallel across value groups). NTILE's bucket is then pure arithmetic on
(rank, n). The only unpartitioned window left runs over the histogram —
if the sort key is near-continuous you quantize it first (the histogram
IS the quantizer); for typical ranking keys (scores, grades, bucketed
prices) the histogram is orders of magnitude smaller than the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load

# ---------------------------------------------------------------------------
# window_ntile_histogram — NTILE(4) with no global sort
# ---------------------------------------------------------------------------

# NTILE(b) over n rows: the first n%b buckets get n//b+1 rows, the rest n//b.
# Rank r (1-based, unique because the sort key is tie-broken by o_orderkey)
# maps to its bucket by integer arithmetic alone:
_NTILE4_CASE = (
    "CAST(CASE WHEN n < 4 THEN rk"
    " WHEN rk <= (n % 4) * ((n div 4) + 1)"
    " THEN (rk - 1) div ((n div 4) + 1) + 1"
    " ELSE (n % 4) + (rk - (n % 4) * ((n div 4) + 1) - 1) div (n div 4) + 1"
    " END AS INT)"
)

_NTILE_HIST_ORACLE = """
SELECT o_orderkey,
       CAST(NTILE(4) OVER (ORDER BY o_totalprice NULLS FIRST, o_orderkey) AS INT)
         AS quartile
FROM orders
"""


@register("window_ntile_histogram", oracle=_NTILE_HIST_ORACLE)
def window_ntile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) over (o_totalprice, o_orderkey) with NO single-reducer
    window over the fact table — the 100 TB plan for the quartile
    assignment that ``window_ntile_percent`` demos with a global window.

    Plan shape: one aggregate (value histogram), one unpartitioned
    cumulative window over that AGGREGATE (key-cardinality-sized), one
    join back on the value key, one PARTITIONED window within value
    groups (parallel), then pure arithmetic. The oracle is plain
    NTILE(4) — byte-identical output proves the rank algebra."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    hist = o.groupBy("o_totalprice").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    wcum = Window.orderBy("o_totalprice").rowsBetween(
        Window.unboundedPreceding, 0
    )
    offs = hist.select(
        "o_totalprice",
        (F.sum("cnt").over(wcum) - F.col("cnt"))
        .cast("bigint")
        .alias("cum_before"),
    )
    n = o.agg(F.count("*").cast("bigint").alias("n"))
    wv = Window.partitionBy("o_totalprice").orderBy("o_orderkey")
    offs_r = offs.withColumnRenamed("o_totalprice", "off_price")
    ranked = (
        # null-safe value-key join (r11 hostile): a NULL price is a value
        # group too — plain equality silently dropped those rows
        o.join(offs_r, F.expr("o_totalprice <=> off_price"))
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("cum_before") + F.row_number().over(wv))
            .cast("bigint")
            .alias("rk"),
        )
    )
    return ranked.crossJoin(F.broadcast(n)).select(
        "o_orderkey", F.expr(_NTILE4_CASE).alias("quartile")
    )
