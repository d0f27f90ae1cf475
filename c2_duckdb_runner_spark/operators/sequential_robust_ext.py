"""Round-4 sequential-testing / robust-variance extensions:

- SEQUENTIAL PROBABILITY RATIO TEST (Wald SPRT) on the daily purchase
  rate — the always-valid sequential monitor the fixed-horizon
  ab_power_mde_check plans for: a running log-likelihood ratio walks
  between ln(β/(1−α)) and ln((1−β)/α) and the experiment stops at the
  FIRST boundary crossing. The two per-observation LLR increments are
  constants, precomputed once in micro-nats and inlined into BOTH
  engines' plans (the NDCG-discount trick), so the walk itself is pure
  integer cumsum;
- BROWN-FORSYTHE robust variance-equality test — Levene's test with
  group MEDIANS (exact lower medians, position-picked) instead of
  means: are document lengths equally dispersed across languages? The
  one-way-F machinery mirrors stats_anova_f_daily but on |x − median|
  transforms, with mean squares divided BEFORE the micro multiply so
  BIGINT holds to ~10⁷ rows per group.

Reference reach: the delegated SQL slot (``main.cc:181-182``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load

# ---------------------------------------------------------------------------
# ab_sequential_sprt
# ---------------------------------------------------------------------------

# H0: p = 0.18, H1: p = 0.22 purchase share; α = β = 0.05.
# Increments and boundaries in micro-nats, computed ONCE here (python
# floats at module-import time, identical constants in both plans).
_SPRT_A_INC = round(math.log(0.22 / 0.18) * 1_000_000)  # per purchase
_SPRT_B_INC = round(math.log(0.78 / 0.82) * 1_000_000)  # per non-purchase
_SPRT_UP = round(math.log(19.0) * 1_000_000)  # ln((1-β)/α)
_SPRT_DN = -_SPRT_UP  # ln(β/(1-α)) (symmetric at α=β)


_SPRT_ORACLE = f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS s,
         CAST(SUM(CASE WHEN event_type='purchase' THEN 0 ELSE 1 END)
              AS BIGINT) AS f
  FROM events GROUP BY 1
),
c AS (
  SELECT day, s, f,
         CAST(SUM(s*({_SPRT_A_INC}) + f*({_SPRT_B_INC}))
              OVER (ORDER BY day) AS BIGINT) AS llr
  FROM d
),
x AS (
  SELECT *, CASE WHEN llr >= {_SPRT_UP} THEN 1
                 WHEN llr <= {_SPRT_DN} THEN -1 ELSE 0 END AS hit
  FROM c
),
first_hit AS (SELECT day, llr, hit FROM x WHERE hit <> 0 ORDER BY day LIMIT 1)
SELECT
  CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days,
  COALESCE((SELECT strftime(day, '%Y-%m-%d') FROM first_hit), 'none')
    AS decision_day,
  CAST(COALESCE((SELECT hit FROM first_hit), 0) AS INT) AS decision,
  CAST((SELECT llr FROM (SELECT llr, day FROM c ORDER BY day DESC LIMIT 1))
       AS BIGINT) AS final_llr_micro
"""


@register("ab_sequential_sprt", oracle=_SPRT_ORACLE)
def ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT monitoring the purchase share day by day (H0 18% vs H1
    22%, α=β=0.05): decision = +1 (accept H1) at the first day the
    cumulative LLR reaches ln 19, −1 below −ln 19, 0 if the data runs
    out undecided. Daily successes/failures aggregate once; the walk is
    an integer cumsum of two precomputed micro-nat constants over the
    CALENDAR-BOUNDED daily series — always-valid sequential testing with
    zero float in the decision path.

    Scale: one conditional-sum scan; windows/top-1 run on days."""
    e = load(spark, sf_dir, "events")
    d = (
        e.select(
            F.to_date("ts").alias("day"),
            F.expr("CASE WHEN event_type='purchase' THEN 1 ELSE 0 END").alias("p"),
        )
        .groupBy("day")
        .agg(
            F.sum("p").cast("bigint").alias("s"),
            (F.count("*") - F.sum("p")).cast("bigint").alias("f"),
        )
    )
    from c2_duckdb_runner_spark.session import scratch_persist

    c = scratch_persist(
        d.withColumn(
            "llr",
            F.sum(F.expr(f"s*({_SPRT_A_INC}) + f*({_SPRT_B_INC})"))
            .over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        ).withColumn(
            "hit",
            F.expr(
                f"CASE WHEN llr >= {_SPRT_UP} THEN 1"
                f" WHEN llr <= {_SPRT_DN} THEN -1 ELSE 0 END"
            ),
        )
    )
    n_days = c.agg(F.count("*").cast("bigint").alias("n_days"))
    first_hit = (
        c.where("hit <> 0")
        .orderBy("day")
        .limit(1)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("decision_day"),
            F.col("hit").cast("int").alias("decision"),
        )
    )
    final = (
        c.orderBy(F.desc("day"))
        .limit(1)
        .select(F.col("llr").alias("final_llr_micro"))
    )
    # undecided default: union a prio-1 fallback row and keep the
    # LOWEST-priority row — an explicit total order, not a bare LIMIT
    # over a union (whose row choice Spark does not guarantee)
    decision = (
        first_hit.withColumn("prio", F.lit(0))
        .unionByName(
            n_days.select(
                F.lit("none").alias("decision_day"),
                F.lit(0).cast("int").alias("decision"),
                F.lit(1).alias("prio"),
            )
        )
        .orderBy("prio")
        .limit(1)
        .drop("prio")
    )
    return (
        n_days.crossJoin(F.broadcast(decision))
        .crossJoin(F.broadcast(final))
        .select("n_days", "decision_day", "decision", "final_llr_micro")
    )


# ---------------------------------------------------------------------------
# stats_brown_forsythe
# ---------------------------------------------------------------------------

_BF_ORACLE = """
WITH rk AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY lang) AS n_g
  FROM documents
),
med AS (SELECT lang, CAST(n_chars AS BIGINT) AS m FROM rk
        WHERE r = (n_g + 1) // 2),
z AS (
  SELECT d.lang, CAST(abs(d.n_chars - med.m) AS BIGINT) AS z
  FROM documents d JOIN med ON med.lang = d.lang
),
g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_g, CAST(SUM(z) AS BIGINT) AS s_g,
             CAST(SUM(z*z) AS BIGINT) AS q_g FROM z GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s, CAST(SUM(q_g) AS BIGINT) AS q,
             CAST(SUM((s_g*s_g) // n_g) AS BIGINT) AS ssb_part FROM g)
SELECT k, n,
  CAST(ssb_part - (s*s) // n AS BIGINT) AS ssb,
  CAST(q - ssb_part AS BIGINT) AS ssw,
  CAST(CASE WHEN q - ssb_part > 0 AND k > 1 AND n > k
       THEN (1000000*((ssb_part - (s*s) // n) // (k - 1)))
            // GREATEST((q - ssb_part) // (n - k), 1)
       ELSE 0 END AS BIGINT) AS f_micro
FROM t
"""


@register("stats_brown_forsythe", oracle=_BF_ORACLE)
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test: one-way F over
    z = |n_chars − group lower-median| across languages — the robust
    Levene variant (medians, not means, so heavy tails can't fake a
    variance difference). The lower median is position-picked per group
    (tie-broken by doc_id, identical both engines); SSB/SSW use
    integer-floor group terms, and both mean squares are divided BEFORE
    the micro multiply so the statistic holds in BIGINT to ~10⁷ rows
    per group. Mirrors stats_anova_f_daily's machinery on the
    dispersion transform it can't see.

    Scale: one rank window partitioned by language, one broadcast
    median join-back, one moment scan — all keyed, no global state."""
    docs = load(spark, sf_dir, "documents")
    rk = docs.select(
        "lang",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("n_chars", "doc_id"))
        .alias("r"),
        F.count("*").over(Window.partitionBy("lang")).alias("n_g"),
    )
    med = rk.where(F.expr("r = (n_g + 1) DIV 2")).select(
        "lang", F.col("n_chars").cast("bigint").alias("m")
    )
    z = docs.join(F.broadcast(med), "lang").select(
        "lang", F.expr("CAST(abs(n_chars - m) AS BIGINT)").alias("z")
    )
    g = z.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("z").cast("bigint").alias("s_g"),
        F.sum(F.expr("z*z")).cast("bigint").alias("q_g"),
    )
    t = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("q_g").cast("bigint").alias("q"),
        F.sum(F.expr("(s_g*s_g) DIV n_g")).cast("bigint").alias("ssb_part"),
    )
    return t.select(
        "k",
        "n",
        F.expr("CAST(ssb_part - (s*s) DIV n AS BIGINT)").alias("ssb"),
        F.expr("CAST(q - ssb_part AS BIGINT)").alias("ssw"),
        F.expr(
            "CAST(CASE WHEN q - ssb_part > 0 AND k > 1 AND n > k"
            " THEN (1000000*((ssb_part - (s*s) DIV n) DIV (k - 1)))"
            " DIV GREATEST((q - ssb_part) DIV (n - k), 1)"
            " ELSE 0 END AS BIGINT)"
        ).alias("f_micro"),
    )
