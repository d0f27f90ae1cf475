"""User-defined functions: scalar pandas UDF, grouped UDAF, Python UDTF.

SURVEY.md §2 rows ``udf_python`` / ``udaf`` / ``udtf`` — reachable in the
reference only as whatever SQL functions the embedded engine ships
(``main.cc:181-182``); here they demonstrate the three extension points a
Spark pipeline actually uses, each on the Arrow path (never row-at-a-time
Python in the hot loop):

- scalar   : ``@pandas_udf`` — Arrow-vectorized, batch-at-a-time numpy.
- UDAF     : ``applyInPandas`` over groups — whole-group pandas frames.
- UDTF     : Spark 4 Python UDTF in a LATERAL join — row-expanding.

100 TB honesty note (SURVEY.md §2 "document 100 TB cost"): every one of
these forks data out of the JVM through Arrow and back — 2-5x slower than
the equivalent built-in expression even when vectorized. The registered
queries deliberately compute things expressible in pure SQL so the DuckDB
oracle can check them; in production you'd only pay the UDF toll for logic
Catalyst genuinely can't express (model scoring, custom tokenizers).

Determinism: all UDF arithmetic is integer-exact (cents, counts) or
identical-fold double math, so cross-engine hashes are stable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "udf_pandas_scalar",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) "
        "AS net_cents FROM lineitem"
    ),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF: net price in integer cents. The whole
    batch is one numpy expression; integer output keeps it exact."""

    @pandas_udf("bigint")
    def net_cents(price: pd.Series, discount: pd.Series) -> pd.Series:
        import numpy as np

        # floor(x+0.5), not .round(): numpy rounds half-to-even while the
        # DuckDB oracle rounds half-away — pin one explicit rule on both sides
        return np.floor(price * (1.0 - discount) * 100 + 0.5).astype("int64")

    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        net_cents("l_extendedprice", "l_discount").alias("net_cents"),
    )


@register(
    "udaf_grouped_pandas",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS sum_price_cents "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregation via applyInPandas: each (returnflag, linestatus)
    group arrives as one pandas frame. Sums are integer-exact (quantity is
    whole-valued, price converted to cents) so group-internal row order —
    which Spark does not guarantee — cannot perturb the result."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "n": [len(pdf)],
                "sum_qty": [int(pdf["l_quantity"].astype("int64").sum())],
                "sum_price_cents": [
                    # floor(x+0.5): same explicit rounding rule as the oracle
                    int(np.floor(pdf["l_extendedprice"] * 100 + 0.5).astype("int64").sum())
                ],
            }
        )

    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .applyInPandas(
            stats,
            schema=(
                "l_returnflag string, l_linestatus string, n bigint, "
                "sum_qty bigint, sum_price_cents bigint"
            ),
        )
    )


@register(
    "udtf_split_tokens",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT d.doc_id, CAST(t.i - 1 AS INTEGER) AS pos, d.toks[CAST(t.i AS INTEGER)] AS token
FROM d, unnest(range(1, len(d.toks) + 1)) AS t(i)
""",
)
def udtf_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding Python UDTF (Spark 4) in a LATERAL join: one document
    row in, one row per token out — the shape custom parsers/chunkers take
    when explode() of a built-in split genuinely can't express them."""

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str) -> Iterator[tuple[int, str]]:
            if text is None:  # NULL text -> no rows (== oracle's
                return        # unnest over a NULL-length range)
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("c2s_split_tokens", SplitTokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("c2s_docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.token "
        "FROM c2s_docs_udtf d, LATERAL c2s_split_tokens(d.text) s"
    )


@register(
    "udf_grouped_arrow",
    oracle=(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
        "MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
)
def udf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-NATIVE grouped map (Spark 4 applyInArrow): each group arrives
    as a pyarrow.Table and is reduced with pyarrow.compute kernels — no
    pandas materialization at all, the cheapest Python boundary Spark
    offers (columnar in, columnar out, zero row objects). Integer-exact
    aggregates keep it oracle-checkable."""
    import pyarrow as pa

    def stats(table: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        qty = pc.cast(table.column("l_quantity"), pa.int64())
        keys = table.column("l_orderkey")
        return pa.table(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "l_linestatus": [table.column("l_linestatus")[0].as_py()],
                "n": [table.num_rows],
                "sum_qty": [pc.sum(qty).as_py()],
                "min_key": [pc.min(keys).as_py()],
                "max_key": [pc.max(keys).as_py()],
            }
        )

    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .applyInArrow(
            stats,
            schema=(
                "l_returnflag string, l_linestatus string, n bigint, "
                "sum_qty bigint, min_key bigint, max_key bigint"
            ),
        )
    )


@register(
    "udtf_polymorphic_ngrams",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, CAST(i AS INT) AS pos, toks[i] AS w1, toks[i+1] AS w2
FROM d CROSS JOIN UNNEST(range(1, len(toks))) AS t(i)
""",
)
def udtf_polymorphic_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 analyze()): the output schema is
    computed at plan time from the literal n — ask for trigrams and the
    function grows a w3 column with no code change. n=2 keeps the DuckDB
    oracle expressible (toks[i], toks[i+1] with ordinality). The UDTF runs
    once per input row under LATERAL, batched through Arrow like any
    Python boundary; schema resolution costs nothing at runtime."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGrams:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            width = int(n.value)
            fields = [StructField("pos", IntegerType())]
            fields += [
                StructField(f"w{i + 1}", StringType()) for i in range(width)
            ]
            return AnalyzeResult(StructType(fields))

        def eval(self, text: str, n: int):
            if text is None:  # NULL text -> no rows, as in split_tokens
                return
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield (i + 1, *toks[i : i + n])

    spark.udtf.register("c2s_ngrams", NGrams)
    load(spark, sf_dir, "documents").createOrReplaceTempView("c2s_docs_ngram")
    return spark.sql(
        "SELECT d.doc_id, g.pos, g.w1, g.w2 "
        "FROM c2s_docs_ngram d, LATERAL c2s_ngrams(d.text, 2) g"
    )


@register(
    "udtf_table_partition_rle",
    oracle="""
WITH e AS (
  SELECT user_id, event_type,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_id
  FROM events
),
t AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ms, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ms, event_id) AS rt
  FROM e
)
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS run_len,
       CAST(MIN(ms) AS BIGINT) AS run_start_ms
FROM t GROUP BY user_id, event_type, rn - rt
""",
)
def udtf_table_partition_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful UDTF over a PARTITIONED, ORDERED table argument (Spark 4:
    ``udtf(TABLE(t) PARTITION BY k ORDER BY o)``): run-length encode each
    user's event-type sequence — consecutive same-type events collapse to
    (type, run_len, run_start). The engine delivers each user's rows to
    ONE udtf instance in timestamp order (the shuffle/sort is planned by
    Catalyst from the TVF syntax, not hand-built), eval() carries the open
    run, terminate() flushes the last — the imperative per-key streaming
    shape that pure SQL needs the two-row_number gaps-and-islands trick
    for (which is exactly what the oracle uses, proving equivalence).
    State is one run tuple per instance; Arrow-batched like every Python
    boundary."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "user_id bigint, event_type string, run_len bigint, "
        "run_start_ms bigint"
    ))
    class Rle:
        def __init__(self):
            self.user = None
            self.etype = None
            self.count = 0
            self.start = None

        def eval(self, row):
            if row.event_type == self.etype and row.user_id == self.user:
                self.count += 1
                return
            if self.count:
                yield (self.user, self.etype, self.count, self.start)
            self.user = row.user_id
            self.etype = row.event_type
            self.count = 1
            self.start = row.ms

        def terminate(self):
            if self.count:
                yield (self.user, self.etype, self.count, self.start)

    spark.udtf.register("c2s_rle", Rle)
    load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ms"),
        "event_id",
    ).createOrReplaceTempView("c2s_events_rle")
    return spark.sql(
        "SELECT * FROM c2s_rle(TABLE(c2s_events_rle) "
        "PARTITION BY user_id ORDER BY (ms, event_id))"
    )


@register(
    "udf_pandas_iterator_model",
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id,
       CAST(1000000 * n_tokens // (n_tokens + 64) AS BIGINT)
         AS model_score_micro,
       CAST(n_chars AS BIGINT) AS n_chars
FROM t
""",
)
def udf_pandas_iterator_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATOR-form pandas UDF (Iterator[Series] -> Iterator[Series]) —
    THE pattern for applying an ML model at scale: expensive per-worker
    setup (model load, tokenizer init) runs ONCE per partition, then every
    Arrow batch streams through the loaded model. The scalar form would
    re-enter Python per batch with no setup amortization; this form is why
    billion-row inference jobs don't reload weights per 10k rows.

    The "model" here is a deterministic stand-in (a saturating token-count
    score in integer micro-units — swap `load_model()` for torch/onnx and
    the plumbing is unchanged); the ORACLE checks the full pipeline
    end-to-end because the stub is exact integer arithmetic. Map-only, no
    shuffle, Arrow-batched."""
    from typing import Iterator

    @pandas_udf("bigint")
    def model_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # --- one-time per-worker setup (the amortized model load) ---
        def load_model():
            # stands in for torch.load(...)/ort.InferenceSession(...):
            # a fixed saturating score f(n) = 1e6 * n / (n + 64)
            return lambda n: (1_000_000 * n) // (n + 64)

        model = load_model()
        for n_tokens in batches:
            # nullable Int64: NULL text -> NULL token count -> NULL score
            # (astype("int64") would raise on the NaN a NULL becomes)
            yield model(n_tokens.astype("Int64"))

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    return d.select(
        "doc_id",
        model_score("n_tokens").alias("model_score_micro"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
