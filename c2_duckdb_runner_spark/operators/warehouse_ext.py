"""Round-3 warehouse-misc extensions: path rollups, concentration metrics,
calendar arithmetic, outer explodes.

Four small but everyday shapes (reference reach: the delegated SQL slot,
``main.cc:181-182``):

- hierarchical path rollup — "directory sizes at every depth" over a
  path-like column, the lakehouse storage-accounting query;
- Gini concentration — how unevenly a measure distributes across a group
  (corpus-balance / revenue-concentration metric), exact via one sorted
  window pass;
- calendar month arithmetic — add_months end-of-month clamping parity
  (the subtle rule every billing pipeline trips over);
- explode_outer — NULL/empty-preserving array expansion (rows must not
  silently vanish when the array is empty).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "rollup_path_hierarchy",
    oracle="""
WITH f AS (
  SELECT 'lake/' || lang || '/' || source || '/doc_'
           || CAST(doc_id AS VARCHAR) AS path,
         n_chars
  FROM documents
),
parts AS (
  SELECT path, n_chars, string_split(path, '/') AS p FROM f
),
pref AS (
  SELECT array_to_string(p[1:d], '/') AS prefix, CAST(d AS BIGINT) AS depth,
         n_chars
  FROM parts CROSS JOIN UNNEST(range(1, len(p))) AS u(d)
)
SELECT prefix, depth,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM pref GROUP BY prefix, depth
""",
)
def rollup_path_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical path rollup — "du -s at every depth" over a path-like
    column: each file contributes to every ancestor prefix, giving file
    counts and byte totals per directory in ONE pass. The storage-
    accounting query every lakehouse runs nightly (and the generic
    tree-rollup: org charts, category trees, URL hierarchies).

    Shape: paths split once, a bounded explode emits (prefix, depth) per
    ancestor — fan-out = path depth (≤ 4 here), map-side — then one
    prefix-keyed rollup. The alternative (self-join per level or N
    scans) re-reads the fact table per depth; this reads it once. Depth
    skew mirrors directory size skew — heavy prefixes are exactly the
    heavy directories, AQE-splittable."""
    f = load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("lake/"),
            F.col("lang"),
            F.lit("/"),
            F.col("source"),
            F.lit("/doc_"),
            F.col("doc_id").cast("string"),
        ).alias("path"),
        "n_chars",
    )
    parts = f.select("path", "n_chars", F.split("path", "/").alias("p"))
    pref = parts.select(
        F.explode(F.expr("sequence(1, size(p) - 1)")).alias("d"),
        "p",
        "n_chars",
    ).select(
        F.array_join(F.expr("slice(p, 1, d)"), "/").alias("prefix"),
        F.col("d").cast("bigint").alias("depth"),
        "n_chars",
    )
    return pref.groupBy("prefix", "depth").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "agg_gini_concentration",
    oracle="""
WITH d AS (
  SELECT lang, doc_id, n_chars FROM documents
),
r AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars NULLS FIRST, doc_id)
           AS i,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM d
)
SELECT lang, CAST(MIN(n) AS BIGINT) AS n_docs,
       CAST(SUM((2 * i - n - 1) * n_chars) AS BIGINT) AS gini_num,
       CAST(MIN(n) * SUM(n_chars) AS BIGINT) AS gini_den,
       CAST(SUM((2 * i - n - 1) * n_chars) * 1000000
            // (MIN(n) * SUM(n_chars)) AS BIGINT) AS gini_ppm
FROM r GROUP BY lang
""",
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration — how unevenly document length distributes
    within each language (0 = perfectly even, →1 = one doc holds all the
    chars): the corpus-balance metric mixture tuning watches, and the
    same formula as revenue concentration. Computed EXACTLY via the
    sorted-rank identity G = Σ(2i−n−1)xᵢ / (n·Σx) — one window pass
    assigns total-ordered ranks (value, then doc_id), one aggregate
    finishes; numerator, denominator, and the ppm ratio are all int64,
    so both engines agree bit-for-bit.

    Shape: one lang-keyed sort window + one keyed rollup — the shuffles
    share the lang partitioning. No float appears anywhere."""
    from pyspark.sql.window import Window

    r = load(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("n_chars", "doc_id"))
        .alias("i"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    return r.groupBy("lang").agg(
        F.min("n").cast("bigint").alias("n_docs"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("n_chars"))
        .cast("bigint")
        .alias("gini_num"),
        (F.min("n") * F.sum("n_chars")).cast("bigint").alias("gini_den"),
        # DECIMAL(38,0) widening + zero guard (r11 hostile): DuckDB's
        # SUM(BIGINT) is HUGEINT so its *1000000 never overflows, while
        # Spark's stays int64 and ANSI-errors at hostile ±2^31 n_chars;
        # a zero denominator is NULL in DuckDB (//) vs ANSI error (div)
        F.expr(
            "CAST(CASE WHEN MIN(n) * SUM(n_chars) <> 0 THEN "
            "CAST(SUM((2 * i - n - 1) * n_chars) AS DECIMAL(38,0)) "
            "* 1000000 div (MIN(n) * SUM(n_chars)) END AS BIGINT)"
        ).alias("gini_ppm"),
    )


@register(
    "fn_add_months_calendar",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d0,
       CAST(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS VARCHAR)
         AS plus_1m,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR)
         AS plus_3m,
       CAST(CAST(last_day(o_orderdate) AS DATE) AS VARCHAR) AS eom,
       (CAST(o_orderdate AS DATE) = CAST(last_day(o_orderdate) AS DATE))
         AS is_eom
FROM orders WHERE o_orderkey % 11 = 0
""",
)
def fn_add_months_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar month arithmetic — the end-of-month CLAMPING rule every
    billing/retention pipeline trips over: Jan 31 + 1 month must be
    Feb 29 (leap) / Feb 28, not Mar 2-3. Spark's ``add_months`` and
    DuckDB's ``+ INTERVAL n MONTH`` both implement the clamped calendar
    semantics — this query pins that they agree day-for-day across the
    fixture's date range, including the leap-February and the 31→30-day
    month transitions, plus ``last_day`` parity.

    Map-only projection; dates compare as DATE values, no timezone in
    play (DATE is civil on both engines)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    # DATE values are pinned to ISO-8601 strings for the hash: pandas maps
    # Spark DATE to datetime.date but DuckDB DATE to datetime64, so equal
    # dates would repr-differ (the same discipline as epoch-millis pinning
    # for timestamps).
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("d0"),
        F.add_months("o_orderdate", 1).cast("string").alias("plus_1m"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus_3m"),
        F.last_day("o_orderdate").cast("string").alias("eom"),
        (F.col("o_orderdate").cast("date") == F.last_day("o_orderdate")).alias(
            "is_eom"
        ),
    )


@register(
    "fn_explode_outer_empty",
    oracle="""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN []
              ELSE string_split(text, ' ')[1:3] END AS toks
  FROM documents
),
x AS (
  SELECT doc_id, u.tok AS tok
  FROM d LEFT JOIN LATERAL UNNEST(toks) AS u(tok) ON TRUE
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(tok) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE tok IS NULL) AS BIGINT) AS n_empty_docs,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM x
""",
)
def fn_explode_outer_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — the NULL/empty-preserving expansion: a plain
    explode silently DROPS rows whose array is empty, which in a
    pipeline means empty documents vanish from per-doc statistics and
    row counts stop reconciling. ``explode_outer`` keeps them as a
    single NULL row (≙ DuckDB LEFT JOIN LATERAL UNNEST … ON TRUE). The
    aggregate proves the reconciliation: n_docs stays the full corpus
    count, and the empty docs are visible as NULL-token rows.

    Every-5th doc gets an empty array by construction so the preserved
    rows are a deterministic, scale-proportional set."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.expr("array()"))
        .otherwise(F.expr("slice(split(text, ' '), 1, 3)"))
        .alias("toks"),
    )
    x = d.select("doc_id", F.explode_outer("toks").alias("tok"))
    return x.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("tok").cast("bigint").alias("n_tokens"),
        F.count(F.when(F.col("tok").isNull(), 1)).cast("bigint").alias(
            "n_empty_docs"
        ),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
