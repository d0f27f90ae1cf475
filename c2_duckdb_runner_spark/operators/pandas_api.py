"""Cogrouped-map pandas API + referential-integrity audit.

``cogroup(...).applyInPandas`` is the last of the four pandas-on-Spark
extension points (scalar UDF / grouped agg / grouped map / cogrouped map):
two DataFrames are hash-partitioned on the same key and each key's pair of
pandas frames lands in one Python call — the escape hatch for per-key
algorithms over TWO inputs (custom as-of matching, per-entity
reconciliation) that a SQL join can't express directly. The registered
query deliberately computes something SQL CAN express (an interval-bounded
pairing count) so the DuckDB oracle checks it exactly.

100 TB honesty note (same as functions/udfs.py): cogroup ships both sides
through Arrow into Python — use it only when the per-key logic genuinely
needs imperative code; the join-shaped oracle here is the faster pure-SQL
formulation.

``audit_fk_orphans`` is the lakehouse referential-integrity audit: every
foreign-key edge of the star schema anti-joined against its parent in one
union'd report. Dims broadcast; each edge is one hash probe over the child
table — the audit costs one scan per child table at any scale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load

_HOUR_MS = 3_600_000


@register(
    "udf_cogrouped_pandas",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
  FROM events WHERE event_type = 'purchase'
), cc AS (SELECT user_id, COUNT(*) AS n_clicks FROM c GROUP BY user_id),
pc AS (SELECT user_id, COUNT(*) AS n_purchases FROM p GROUP BY user_id),
pairs AS (
  SELECT c.user_id, COUNT(*) AS n_pairs
  FROM c JOIN p ON c.user_id IS NOT DISTINCT FROM p.user_id
              AND p.ms >= c.ms AND p.ms <= c.ms + {_HOUR_MS}
  GROUP BY c.user_id
)
SELECT COALESCE(cc.user_id, pc.user_id) AS user_id,
       COALESCE(cc.n_clicks, 0) AS n_clicks,
       COALESCE(pc.n_purchases, 0) AS n_purchases,
       COALESCE(pairs.n_pairs, 0) AS n_pairs
FROM cc FULL JOIN pc ON cc.user_id IS NOT DISTINCT FROM pc.user_id
LEFT JOIN pairs
  ON COALESCE(cc.user_id, pc.user_id) IS NOT DISTINCT FROM pairs.user_id
""",
)
def udf_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map applyInPandas: clicks and purchases co-partitioned on
    user_id; each user's two pandas frames arrive in one Python call that
    counts purchase events falling within 1 hour after any click
    (searchsorted over the sorted purchase times — O(n log n) per user,
    integer-exact). Keys present on either side are emitted, matching the
    oracle's FULL JOIN. The pattern stands in for per-entity
    reconciliation logic that genuinely needs imperative code.

    r11 optimization round: both inputs are EXPLICITLY hash-repartitioned
    on user_id at the session shuffle width. Without it, AQE coalesces
    the cogroup's tiny-by-bytes exchange to ONE partition and every
    group's pandas call runs through a single Python worker (measured
    par < 1.1 in the r11 baseline) — AQE sizes by shuffle bytes and
    cannot see per-group Python cost (guide §4). An explicit width is
    respected by AQE, so the Python stage keeps the cluster busy at any
    scale."""
    from c2_duckdb_runner_spark.session import shuffle_width

    w = shuffle_width(spark)
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ms")
        .repartition(w, "user_id")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ms")
        .repartition(w, "user_id")
    )

    def pair_counts(key: tuple, cdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # NULL timestamps never satisfy the window comparisons (three-
        # valued logic in the oracle's join predicate), but their rows DO
        # count toward n_clicks/n_purchases (COUNT(*)); NULL user_id is a
        # GROUP key here (grouping semantics, null-safe on the oracle via
        # IS NOT DISTINCT FROM)
        p_ms = np.sort(pdf["ms"].dropna().to_numpy(dtype="int64"))
        c_ms = cdf["ms"].dropna().to_numpy(dtype="int64")
        # per click: purchases in [c, c + 1h] — two binary searches
        n_pairs = int(
            (
                np.searchsorted(p_ms, c_ms + _HOUR_MS, side="right")
                - np.searchsorted(p_ms, c_ms, side="left")
            ).sum()
        )
        return pd.DataFrame(
            {
                "user_id": pd.array([key[0]], dtype="Int64"),
                "n_clicks": [len(cdf)],
                "n_purchases": [len(pdf)],
                "n_pairs": [n_pairs],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            pair_counts,
            schema="user_id bigint, n_clicks bigint, n_purchases bigint, n_pairs bigint",
        )
    )


# (edge label, child table, child key, parent table, parent key)
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _orphan_sql(edge: str, child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{edge}' AS fk_edge,
       CAST(COUNT(*) AS BIGINT) AS n_child_rows,
       CAST(COUNT(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS BIGINT)
         AS n_orphans
FROM {child} c"""


@register(
    "audit_fk_orphans",
    oracle="\nUNION ALL\n".join(_orphan_sql(*e) for e in _FK_EDGES),
)
def audit_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the star schema:
    each child table anti-joins its parent's key set and reports total vs
    orphan rows, union'd into one report. Parents are dimension-sized so
    the probes broadcast; each edge costs one pass over its child table —
    the audit is scan-bound and embarrassingly parallel across edges. The
    all-zeros orphan column IS the assertion a lakehouse ingest gate
    checks before publishing a snapshot.

    r11 optimization round: each edge now computes BOTH counts in one
    broadcast LEFT join pass (total rows + rows whose probe missed,
    the oracle's COUNT FILTER shape) instead of an anti-join count plus
    a separate full-scan count.

    r12 optimization round: all edges of the SAME child table share ONE
    scan — the child chains one broadcast LEFT join per parent and a
    single aggregate emits every edge's (total, orphan) pair, unpivoted
    with stack() into the per-edge report rows. One scan + one aggregate
    stage per child table (lineitem: 3 scans → 1) instead of one per
    edge; the dim-sized parent DISTINCTs are unchanged (they keep the
    LEFT join at-most-one-match, so n_child_rows cannot inflate even if
    a hostile parent fixture carries duplicate keys)."""
    by_child: dict[str, list[tuple[str, str, str, str]]] = {}
    for edge, child, ck, parent, pk in _FK_EDGES:
        by_child.setdefault(child, []).append((edge, ck, parent, pk))
    out: DataFrame | None = None
    for child, edges in by_child.items():
        j = load(spark, sf_dir, child)
        for i, (_edge, ck, parent, pk) in enumerate(edges):
            p = (
                load(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk{i}"))
                .distinct()
                .withColumn(f"__hit{i}", F.lit(1))
            )
            j = j.join(F.broadcast(p), j[ck] == p[f"__pk{i}"], "left")
        aggs = [F.count("*").alias("__n")] + [
            F.count(F.when(F.col(f"__hit{i}").isNull(), 1)).alias(f"__o{i}")
            for i in range(len(edges))
        ]
        stack_args = ", ".join(
            f"'{edge}', __n, __o{i}" for i, (edge, _, _, _) in enumerate(edges)
        )
        rows = j.agg(*aggs).select(
            F.expr(
                f"stack({len(edges)}, {stack_args}) AS "
                "(fk_edge, n_child_rows, n_orphans)"
            )
        )
        out = rows if out is None else out.unionByName(rows)
    assert out is not None
    return out


@register(
    "pandas_on_spark_api",
    oracle="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY lang
""",
)
def pandas_on_spark_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third API surface — pandas-on-Spark (pyspark.pandas): a
    pandas-shaped groupby/agg whose every step PLANS to the same Catalyst
    operators as the DataFrame form (distributed-sequence index avoids the
    global-ordering window a default pandas index would force). ps code is
    how data scientists will drive this engine; this proves it hits the
    same engine, same results, to_spark() round-trip included."""
    import pyspark.pandas as ps

    prev = ps.get_option("compute.default_index_type")
    ps.set_option("compute.default_index_type", "distributed")
    try:
        pdf = ps.read_parquet(f"{sf_dir}/documents.parquet")
        out = pdf.groupby("lang", as_index=False).agg(
            n=("n_chars", "count"),
            total_chars=("n_chars", "sum"),
            max_chars=("n_chars", "max"),
        )
        sdf = out.to_spark()
    finally:
        ps.set_option("compute.default_index_type", prev)
    return sdf.select(
        "lang",
        F.col("n").cast("bigint").alias("n"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
        F.col("max_chars").cast("bigint").alias("max_chars"),
    )
