"""Sketch aggregates and time-series downsampling: mergeable HLL sketches,
GK approximate percentiles, OHLC bars, and EXISTS-annotation.

Sketches are THE 100 TB aggregation strategy: a sketch is a small mergeable
partial state, so distinct counts and percentiles compute with map-side
partials, merge across partitions/days/increments, and never hold raw
values. Reached through the reference's delegated SQL slot
(``main.cc:181-182``); DuckDB's approx_count_distinct/approx_quantile are
the same capability with different sketch internals, so the sketch queries
carry accuracy-pinned VERDICT oracles — exact twin columns hash-matched
cross-engine plus a bit asserting the sketch met its error bound — and are
additionally pinned by tests/test_sketches.py.

Scale notes:
- ``agg_hll_sketch_union`` demonstrates re-aggregatable distincts: per-type
  sketches persist as binary columns; the global count is a UNION of
  sketches, not a re-scan — incremental distinct maintenance.
- ``agg_approx_percentile`` is one pass, bounded memory (GK summary with
  rank error n/accuracy) vs the exact ordered-statistic baseline
  (``agg_percentiles``) that buffers values.
- ``ts_ohlc_bars`` computes open/close as min/max-of-(ms, id, value)
  structs — a map-side-combinable single aggregate, no per-bar window
  sort; the canonical columnar downsampler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load

_HOUR_MS = 3_600_000


@register(
    "ts_ohlc_bars",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) // {_HOUR_MS} AS hr,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_id, value
  FROM events
), ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY user_id, hr ORDER BY ms, event_id) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY user_id, hr ORDER BY ms DESC, event_id DESC)
      AS rn_d
  FROM e
)
SELECT user_id, hr,
       CAST(MIN(CASE WHEN rn_a = 1 THEN value END) AS DOUBLE) AS open,
       CAST(MAX(value) AS DOUBLE) AS high,
       CAST(MIN(value) AS DOUBLE) AS low,
       CAST(MIN(CASE WHEN rn_d = 1 THEN value END) AS DOUBLE) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM ranked GROUP BY user_id, hr
""",
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsampling per user: open/close are the values at the
    (ms, event_id)-min/max — computed as min/max of a (ms, event_id,
    value) struct inside ONE grouped aggregate, so the whole bar builder
    is a single map-side-combinable pass with no window sort (the oracle
    spells the same semantics with ROW_NUMBER). event_id uniqueness makes
    the order total, so ties at the same millisecond are deterministic."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_millis(ts) div {_HOUR_MS}").alias("hr"),
        F.unix_millis("ts").alias("ms"),
        "event_id",
        "value",
    )
    return e.groupBy("user_id", "hr").agg(
        F.min(F.struct("ms", "event_id", "value"))["value"].alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.struct("ms", "event_id", "value"))["value"].alias("close"),
        F.count("*").alias("n_ticks"),
    )


@register(
    "join_exists_projection",
    oracle="""
SELECT o.o_orderkey,
       EXISTS(SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
         AS has_bulk,
       NOT EXISTS(SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
         AS no_deep_discount
FROM orders o
""",
)
def join_exists_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as PROJECTED booleans (not filters): annotate
    every order with per-subquery flags. Catalyst plans each as an
    ExistenceJoin — a semi-join variant that emits the match bit instead
    of dropping rows — so both probes hash-join on o_orderkey; no
    per-row re-scan, no row loss. The flag-annotation shape feeds label
    columns in curation pipelines."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_ex")
    return spark.sql("""
SELECT o.o_orderkey,
       EXISTS(SELECT 1 FROM lineitem_ex l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
         AS has_bulk,
       NOT EXISTS(SELECT 1 FROM lineitem_ex l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
         AS no_deep_discount
FROM orders_ex o
""")


def _hll_sketch_union_estimates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, Spark 3.5+): build one
    user_id sketch per event_type, then derive BOTH per-type estimates and
    the global estimate by UNIONING the sketches — the global count never
    re-touches raw data. This re-aggregatability is what makes distinct
    counting incremental at 100 TB: persist per-partition/day sketch
    columns, merge on read."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.count("*").alias("n_events"),
    )
    typed = per_type.select(
        "event_type",
        F.expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").alias("approx_users"),
        "n_events",
    )
    merged = per_type.agg(
        F.expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)").alias(
            "approx_users"
        ),
        F.sum("n_events").alias("n_events"),
    ).select(F.lit("__all__").alias("event_type"), "approx_users", "n_events")
    return typed.unionByName(merged)


@register(
    "agg_hll_sketch_union",
    oracle=(
        # Accuracy-pinned verdict oracle: DataSketches HLL (Spark) and
        # DuckDB's HLL are different sketches, so the estimates are never
        # byte-comparable; both engines instead hash-match the EXACT
        # distinct counts and event totals per type (and globally) plus a
        # verdict bit that their own approx estimate sits within
        # max(3, 5% of exact) — ~3 standard deviations of a lgK=12 sketch.
        "WITH typed AS ("
        "  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, "
        "         CAST(approx_count_distinct(user_id) AS BIGINT) AS au "
        "  FROM events GROUP BY event_type "
        "  UNION ALL "
        "  SELECT '__all__', CAST(COUNT(*) AS BIGINT), "
        "         CAST(COUNT(DISTINCT user_id) AS BIGINT), "
        "         CAST(approx_count_distinct(user_id) AS BIGINT) "
        "  FROM events"
        ") "
        "SELECT event_type, n_events, exact_users, "
        "CAST(CASE WHEN ABS(CAST(au AS DOUBLE) - exact_users) <= "
        "GREATEST(3.0, 0.05 * exact_users) THEN 1 ELSE 0 END AS INT) "
        "AS within_rsd FROM typed"
    ),
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-union distinct counting, accuracy-verified: the per-type and
    union-merged HLL estimates (`_hll_sketch_union_estimates` — the
    re-aggregatable 100 TB path) are checked against exact twins computed
    in the same job, emitting hash-matched exact counts plus a per-row
    verdict bit. The exact side exists only to ground the verdict; in
    production the sketch column alone persists and merges."""
    est = _hll_sketch_union_estimates(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    exact_typed = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    exact_all = ev.agg(
        F.countDistinct("user_id").alias("exact_users")
    ).select(F.lit("__all__").alias("event_type"), "exact_users")
    exact = exact_typed.unionByName(exact_all).withColumnRenamed(
        "event_type", "ex_et"
    )
    # null-safe: hostile NULL event_type is a group and must not be
    # dropped by the verdict join (r11 hostile pin)
    j = est.join(exact, F.expr("event_type <=> ex_et"))
    ok = F.abs(
        F.col("approx_users").cast("double") - F.col("exact_users")
    ) <= F.greatest(F.lit(3.0), 0.05 * F.col("exact_users"))
    return j.select(
        "event_type",
        "n_events",
        "exact_users",
        ok.cast("int").alias("within_rsd"),
    )


# NOTE: these two helpers run INSIDE the applyInPandas worker. Module-level
# functions cloudpickle by REFERENCE, which would make every Python worker
# import this package — broken for a consuming driver running from another
# cwd. agg_countmin_freq therefore registers this module for pickle-BY-VALUE
# before shipping the closure (same lesson as
# sources/python_datasource._pickle_by_value).
def _cms_parse(b: bytes):
    """Parse Spark's CountMinSketch binary (CountMinSketchImpl.writeTo):
    big-endian version(i32), totalCount(i64), depth(i32), width(i32),
    hashA[depth] (i64), table[depth][width] (i64). Public format — written
    by the built-in ``count_min_sketch`` aggregate."""
    import struct

    off = 0
    (_ver,) = struct.unpack_from(">i", b, off)
    off += 4
    (total,) = struct.unpack_from(">q", b, off)
    off += 8
    (depth,) = struct.unpack_from(">i", b, off)
    off += 4
    (width,) = struct.unpack_from(">i", b, off)
    off += 4
    hash_a = list(struct.unpack_from(f">{depth}q", b, off))
    off += 8 * depth
    table = []
    for _ in range(depth):
        table.append(list(struct.unpack_from(f">{width}q", b, off)))
        off += 8 * width
    return total, depth, width, hash_a, table


def _cms_estimate_long(depth, width, hash_a, table, x: int) -> int:
    """Point-query a parsed sketch for an int64 key — min over the depth
    rows of table[i][hash_i(x)], replicating CountMinSketchImpl.hashLong
    (64-bit wrap, arithmetic >>32 fold, mod Mersenne prime 2^31-1)."""
    prime = (1 << 31) - 1
    best = None
    for i in range(depth):
        h = (hash_a[i] * x) & 0xFFFFFFFFFFFFFFFF
        if h >= 1 << 63:  # reinterpret as Java signed long
            h -= 1 << 64
        h += h >> 32
        h &= prime
        v = table[i][h % width]
        if best is None or v < best:
            best = v
    return int(best)


_CMS_EPS = 0.005
_CMS_CONF = 0.99
_CMS_SEED = 42
_CMS_PROBE_USERS = list(range(1, 11))


_CMS_ORACLE = """
WITH types AS (
  SELECT DISTINCT event_type FROM events
  UNION ALL SELECT '__all__'
),
probe AS (SELECT CAST(u AS BIGINT) AS user_id FROM range(1, 11) t(u)),
ex AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE user_id BETWEEN 1 AND 10
  GROUP BY event_type, user_id
  UNION ALL
  SELECT '__all__' AS event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE user_id BETWEEN 1 AND 10
  GROUP BY user_id
)
SELECT t.event_type, p.user_id,
       CAST(COALESCE(e.c, 0) AS BIGINT) AS exact_count,
       CAST(1 AS INT) AS within_eps
FROM types t
CROSS JOIN probe p
LEFT JOIN ex e ON e.event_type IS NOT DISTINCT FROM t.event_type
              AND e.user_id = p.user_id
"""


@register(
    "agg_countmin_freq",
    # Verdict oracle with an honest asymmetry: DuckDB has no Count-Min
    # sketch, so it cannot self-check an estimate — it emits the exact
    # probe-grid counts plus the guarantee's EXPECTED verdict (1). The hash
    # therefore verifies Spark's exact counts per (type, probe user) AND
    # that the CMS bound true ≤ est ≤ true + eps·N held on every probe;
    # a broken sketch parse/merge flips Spark's bit and the hash goes red.
    oracle=_CMS_ORACLE,
)
def agg_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency estimation via mergeable Count-Min sketches: one bounded-
    memory pass builds a per-event_type CMS of user_id (built-in JVM
    ``count_min_sketch`` aggregate — map-side combinable partial state,
    never holds raw keys), then a driver-sized merge step adds the tables
    element-wise (CMS merge IS vector addition for same depth/width/seed)
    and point-queries a fixed probe set of user ids per type AND globally.

    The 100 TB shape: raw 'how often does key X appear' over an arbitrary
    key universe needs either a full groupBy(key) shuffle or a sketch;
    the sketch is ~10 KB per group, re-aggregatable across partitions /
    days / sources without re-scanning. Guarantee: true ≤ est ≤ true +
    eps·N with prob ≥ confidence — checked in-query against exact probe
    counts (the hash-matched verdict columns) and again by
    tests/test_sketches.py."""
    import sys

    import pandas as pd

    try:  # ship this module by value inside the pickled closure (see NOTE)
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass

    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr(
            f"count_min_sketch(user_id, {_CMS_EPS}d, {_CMS_CONF}d, {_CMS_SEED})"
        ).alias("sk")
    )

    probe = _CMS_PROBE_USERS

    def merge_and_probe(pdf: pd.DataFrame) -> pd.DataFrame:
        parsed = {
            r.event_type: _cms_parse(bytes(r.sk)) for r in pdf.itertuples()
        }
        rows = []
        # hostile NULL event_type is a valid group key; None can't be
        # compared to str, so sort with an explicit null-first key
        for etype, (_tot, depth, width, ha, tab) in sorted(
            parsed.items(), key=lambda kv: (kv[0] is not None, kv[0] or "")
        ):
            for u in probe:
                rows.append(
                    (etype, u, _cms_estimate_long(depth, width, ha, tab, u))
                )
        # element-wise merge of all per-type sketches (identical params)
        first = next(iter(parsed.values()))
        depth, width, ha = first[1], first[2], first[3]
        merged = [[0] * width for _ in range(depth)]
        for _tot, _d, _w, _ha, tab in parsed.values():
            for i in range(depth):
                row = merged[i]
                ti = tab[i]
                for j in range(width):
                    row[j] += ti[j]
        for u in probe:
            rows.append(
                ("__all__", u, _cms_estimate_long(depth, width, ha, merged, u))
            )
        return pd.DataFrame(
            rows, columns=["event_type", "user_id", "est_count"]
        )

    # one group (a handful of ~10 KB sketches — driver-sized by
    # construction); Arrow-batched boundary like every Python step here
    est = per_type.groupBy(F.lit(1).alias("g")).applyInPandas(
        merge_and_probe,
        schema="event_type string, user_id bigint, est_count bigint",
    )

    # exact probe-grid twins ground the verdict: per-type and global N for
    # the eps·N bound, exact counts for the probe users (tiny filtered
    # aggregates — the probe set is fixed, never the key universe)
    n_typed = ev.groupBy("event_type").agg(F.count("*").alias("n_rows"))
    n_all = ev.agg(F.count("*").alias("n_rows")).select(
        F.lit("__all__").alias("event_type"), "n_rows"
    )
    ns = n_typed.unionByName(n_all)
    probed = ev.filter(F.col("user_id").isin(probe))
    ex_typed = probed.groupBy("event_type", "user_id").agg(
        F.count("*").alias("c")
    )
    ex_all = probed.groupBy("user_id").agg(F.count("*").alias("c")).select(
        F.lit("__all__").alias("event_type"), "user_id", "c"
    )
    exacts = ex_typed.unionByName(ex_all)
    # null-safe joins: hostile NULL event_type is a GROUP here, and a
    # plain equi-join silently drops it (r11 hostile pin, both sides)
    ns_r = ns.withColumnRenamed("event_type", "ns_et")
    ex_r = exacts.withColumnRenamed("event_type", "ex_et") \
        .withColumnRenamed("user_id", "ex_uid")
    j = (
        est.join(F.broadcast(ns_r), F.expr("event_type <=> ns_et"))
        .join(
            F.broadcast(ex_r),
            F.expr("event_type <=> ex_et AND user_id = ex_uid"),
            "left",
        )
    )
    exact_count = F.coalesce(F.col("c"), F.lit(0)).cast("long")
    ok = (exact_count <= F.col("est_count")) & (
        F.col("est_count") <= exact_count + _CMS_EPS * F.col("n_rows")
    )
    return j.select(
        "event_type",
        "user_id",
        exact_count.alias("exact_count"),
        ok.cast("int").alias("within_eps"),
    )


@register(
    "agg_approx_percentile",
    oracle=(
        # Accuracy-pinned verdict oracle (same pattern as
        # agg_approx_distinct): GK summaries (Spark) and t-digest (DuckDB)
        # never agree byte-for-byte, but both engines can assert their OWN
        # approx p50/p95/p99 lands between their exact percentiles at
        # p ± 2.5% rank — a ~25× looser band than GK's n/10000 guarantee,
        # so the bit is deterministic-true for both, yet a broken sketch
        # path still flips it. n is exact and hash-matched per group.
        # non-finite values leave the ordered set on both sides (r11
        # hostile NaN pin — engines rank NaN differently in quantiles)
        "WITH r AS (SELECT l_returnflag, CASE WHEN isfinite(l_extendedprice)"
        " THEN l_extendedprice END AS px FROM lineitem) "
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(CASE WHEN "
        "approx_quantile(px, 0.5) BETWEEN "
        "  quantile_cont(px, 0.475) AND "
        "  quantile_cont(px, 0.525) "
        "AND approx_quantile(px, 0.95) BETWEEN "
        "  quantile_cont(px, 0.925) AND "
        "  quantile_cont(px, 0.975) "
        "AND approx_quantile(px, 0.99) BETWEEN "
        "  quantile_cont(px, 0.965) AND "
        "  quantile_cont(px, 1.0) "
        "THEN 1 ELSE 0 END AS INT) AS within_rank_err "
        "FROM r GROUP BY l_returnflag"
    ),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna summary): p50/p95/p99 of
    extended price per return flag in one bounded-memory pass — the scale
    path next to the exact ordered-statistic baseline (agg_percentiles),
    which buffers every value. Rank error ≤ n/accuracy (accuracy 10000).

    Cross-engine check: sketch internals differ (DuckDB uses t-digest), so
    each engine emits a verdict bit — its approx estimate must land between
    its exact percentiles at p ± 2.5% rank — alongside the exact group
    count; tests/test_sketches.py additionally pins the tight n/10000 GK
    bound against the exact ordered statistic."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "px",
        F.expr("CASE WHEN NOT isnan(l_extendedprice) AND "
               "abs(l_extendedprice) <> double('inf') "
               "THEN l_extendedprice END"),
    )
    # DISCRETE brackets on the Spark side (r11 hostile): GK's estimate is
    # an ACTUAL data value, so at hostile-shrunk group sizes it can sit
    # below the INTERPOLATED p-2.5% bracket while still being rank-exact;
    # percentile_disc brackets are the rank-sound bound for a discrete
    # estimator (est's cume rank in [p-eps, p+eps] implies
    # disc(p-eps) <= est <= disc(p+eps)). DuckDB keeps cont brackets for
    # its interpolating t-digest. An all-NaN/NULL group is vacuously
    # unverified (bit 0) in both engines.
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr(
            "approx_percentile(px, array(0.5, 0.95, 0.99), 10000)"
        ).alias("pcts"),
        F.array(
            F.expr("percentile_disc(0.475) WITHIN GROUP (ORDER BY px)"),
            F.expr("percentile_disc(0.925) WITHIN GROUP (ORDER BY px)"),
            F.expr("percentile_disc(0.965) WITHIN GROUP (ORDER BY px)"),
        ).alias("lo"),
        F.array(
            F.expr("percentile_disc(0.525) WITHIN GROUP (ORDER BY px)"),
            F.expr("percentile_disc(0.975) WITHIN GROUP (ORDER BY px)"),
            F.expr("percentile_disc(1.0) WITHIN GROUP (ORDER BY px)"),
        ).alias("hi"),
    )
    ok = F.expr(
        "pcts[0] BETWEEN lo[0] AND hi[0] AND "
        "pcts[1] BETWEEN lo[1] AND hi[1] AND "
        "pcts[2] BETWEEN lo[2] AND hi[2]"
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.coalesce(ok, F.lit(False)).cast("int").alias("within_rank_err"),
    )


@register(
    "agg_theta_set_ops",
    oracle=(
        # Same verdict pattern as the HLL/CMS oracles: DuckDB computes the
        # EXACT audience-overlap counts (hash-matched) and the expected
        # verdict; Spark computes the same exact counts plus theta-sketch
        # estimates and asserts each estimate lands within max(3, 5%) of
        # its exact twin. Theta default lgK=12 → ~2% rse, so the bit is
        # deterministic-true until a sketch/set-op path breaks.
        "WITH c AS (SELECT DISTINCT user_id FROM events "
        "           WHERE event_type = 'click'), "
        "p AS (SELECT DISTINCT user_id FROM events "
        "      WHERE event_type = 'purchase') "
        "SELECT "
        "CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click, "
        "CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase, "
        "CAST((SELECT COUNT(*) FROM c JOIN p USING (user_id)) AS BIGINT) "
        "  AS n_both, "
        "CAST((SELECT COUNT(*) FROM (SELECT * FROM c UNION SELECT * FROM p)) "
        "  AS BIGINT) AS n_either, "
        "CAST(1 AS INT) AS within_rse"
    ),
)
def agg_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (DataSketches, Spark 4.1): SET ALGEBRA on sketches —
    intersection and union cardinalities of the click vs purchase
    audiences WITHOUT re-touching raw data. This is the capability HLL
    fundamentally lacks (HLL unions but cannot intersect); at 100 TB it is
    the audience-overlap / funnel-intersection primitive: persist one
    ~16 KB theta sketch per segment per day, answer any pairwise overlap
    later by sketch algebra alone. Exact twins ride along for the verdict
    (and are what the cross-engine hash compares)."""
    ev = load(spark, sf_dir, "events")
    sk = ev.filter(
        F.col("event_type").isin("click", "purchase")
    ).groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    )
    pair = (
        sk.filter(F.col("event_type") == "click")
        .select(F.col("sk").alias("a"), F.col("exact").alias("n_click"))
        .crossJoin(
            sk.filter(F.col("event_type") == "purchase").select(
                F.col("sk").alias("b"), F.col("exact").alias("n_purchase")
            )
        )
    )
    exact_both = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count("*").alias("n_both"))
    )
    exact_either = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .agg(F.countDistinct("user_id").alias("n_either"))
    )
    est = pair.crossJoin(F.broadcast(exact_both)).crossJoin(
        F.broadcast(exact_either)
    ).select(
        "n_click",
        "n_purchase",
        "n_both",
        "n_either",
        F.expr(
            "theta_sketch_estimate(theta_intersection(a, b))"
        ).alias("est_both"),
        F.expr("theta_sketch_estimate(theta_union(a, b))").alias("est_either"),
    )

    def ok(est_c: str, exact_c: str):
        return F.abs(
            F.col(est_c).cast("double") - F.col(exact_c)
        ) <= F.greatest(F.lit(3.0), 0.05 * F.col(exact_c))

    return est.select(
        "n_click",
        "n_purchase",
        "n_both",
        "n_either",
        (ok("est_both", "n_both") & ok("est_either", "n_either"))
        .cast("int")
        .alias("within_rse"),
    )


@register(
    "agg_kll_quantile_merge",
    oracle=(
        # Verdict oracle: exact per-flag counts hash-matched; each engine
        # asserts its own approx-median machinery is within +-2.5% rank of
        # exact (Spark: KLL sketches MERGED across groups — the
        # re-aggregatable path; DuckDB: approx_quantile).
        "WITH r AS (SELECT l_returnflag, CASE WHEN isfinite(l_extendedprice)"
        " THEN l_extendedprice END AS px FROM lineitem), "
        "g AS ("
        "  SELECT l_returnflag, COUNT(*) AS n, "
        "         approx_quantile(px, 0.5) AS est, "
        "         quantile_cont(px, 0.475) AS lo, "
        "         quantile_cont(px, 0.525) AS hi "
        "  FROM r GROUP BY l_returnflag "
        "  UNION ALL "
        "  SELECT '__all__', COUNT(*), approx_quantile(px, 0.5),"
        "         quantile_cont(px, 0.475), "
        "         quantile_cont(px, 0.525) "
        "  FROM r"
        ") "
        "SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
        "CAST(CASE WHEN est BETWEEN lo AND hi THEN 1 ELSE 0 END AS INT) "
        "  AS within_rank_err FROM g"
    ),
)
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches (DataSketches, Spark 4.1) with MERGE: one
    bounded-memory sketch per return flag, then the GLOBAL median comes
    from kll_sketch_merge of the group sketches — never re-scanning rows.
    This is what approx_percentile (GK) cannot do across precomputed
    groups: persist per-partition/day sketches, merge on read, query any
    quantile. Exact twins (count + p47.5/p52.5 bracket) ground the
    verdict; the global row's estimate comes from the merged sketch, so a
    broken merge path flips the '__all__' bit."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "price_d",
        F.expr("CASE WHEN NOT isnan(l_extendedprice) AND "
               "abs(l_extendedprice) <> double('inf') "
               "THEN CAST(l_extendedprice AS DOUBLE) END"),
    )
    per_flag = li.groupBy("l_returnflag").agg(
        F.expr("kll_sketch_agg_double(price_d)").alias("sk"),
        F.count("*").alias("n"),
        F.array(
            F.expr("percentile_disc(0.475) WITHIN GROUP (ORDER BY price_d)"),
            F.expr("percentile_disc(0.525) WITHIN GROUP (ORDER BY price_d)"),
        ).alias("br"),
    )
    flag_rows = per_flag.select(
        "l_returnflag",
        "n",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("est"),
        F.col("br")[0].alias("lo"),
        F.col("br")[1].alias("hi"),
    )
    merged = per_flag.agg(
        F.expr("kll_merge_agg_double(sk)").alias("sk"),
        F.sum("n").alias("n"),
    )
    # discrete brackets (r11 hostile): KLL's quantile is an actual data
    # value — rank-sound bounds are percentile_disc, not interpolation
    global_br = li.agg(
        F.array(
            F.expr("percentile_disc(0.475) WITHIN GROUP (ORDER BY price_d)"),
            F.expr("percentile_disc(0.525) WITHIN GROUP (ORDER BY price_d)"),
        ).alias("br")
    )
    all_row = merged.crossJoin(F.broadcast(global_br)).select(
        F.lit("__all__").alias("l_returnflag"),
        "n",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("est"),
        F.col("br")[0].alias("lo"),
        F.col("br")[1].alias("hi"),
    )
    rows = flag_rows.unionByName(all_row)
    return rows.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.coalesce(
            F.col("est").between(F.col("lo"), F.col("hi")), F.lit(False)
        ).cast("int").alias("within_rank_err"),
    )
