"""Training-data mixture & curation operators: domain-weighted sampling,
overlapping chunking, product-quantization codes, normalization dedup, and
corpus rarity scoring.

These extend the north-star curation surface (BASELINE.json; reached through
the reference's delegated SQL slot, ``main.cc:181-182``) with the remaining
shapes a 100 TB pretraining pipeline runs daily: mix domains by weight,
chunk documents with overlap for training windows, compress embeddings to
PQ codes for ANN, collapse near-identical normalized text, and score
token rarity against the corpus unigram table.

Determinism: sampling is md5-threshold (stable across runs, partitionings,
and engines); PQ distances fold into DECIMAL(26,18) exactly; rarity uses
integer division (micros) — no float drifts anywhere.

Scale notes (100 TB design point):
- ``sample_weighted_mixture`` is a pure row predicate against a broadcast
  4-row weights relation: evaluates in the scan stage, no shuffle, and the
  mixture config is data (a table), not code.
- ``doc_chunk_overlap`` is map-only (explode of a per-row sequence): chunk
  count ≈ n_tokens/stride per doc, emitted streaming — the canonical
  fan-out-without-shuffle shape.
- ``simsearch_pq_assign`` broadcasts 8 codewords × 4 subspaces and reduces
  with a single min-of-struct aggregate (map-side combinable) — no window
  sort, one shuffle keyed (vec_id, subspace). PQ at scale: 64 floats →
  4 bytes per vector, the memory step that makes billion-vector ANN fit.
- ``dedup_normalized_text`` shuffles once on the 16-byte norm hash, never
  on raw text.
- ``text_rarity_score`` is the corpus-frequency join: token→freq is built
  with one aggregate and joined back on the token key; AQE broadcasts it
  when the vocabulary is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load

# bucket (source number mod 4) -> md5-hex-prefix threshold ≈ sampling rate
_MIX_WEIGHTS = [(0, "20"), (1, "40"), (2, "80"), (3, "c0")]  # 12.5/25/50/75 %


@register(
    "sample_weighted_mixture",
    oracle="""
WITH d AS (
  SELECT doc_id, source, n_chars,
         CAST(substring(source, 4) AS INTEGER) % 4 AS bucket,
         substring(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) AS h
  FROM documents
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE d.h < w.thr) AS BIGINT) AS n_sampled,
       CAST(SUM(d.n_chars) FILTER (WHERE d.h < w.thr) AS BIGINT)
         AS sampled_chars
FROM d JOIN (VALUES (0, '20'), (1, '40'), (2, '80'), (3, 'c0')) AS w(bucket, thr)
  ON d.bucket = w.bucket
GROUP BY d.source
""",
)
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-weighted mixture sampling: each source family gets its own
    sampling rate from a 4-row weights relation (mixture config as DATA,
    broadcast-joined), and membership is md5(doc_id:source) hex-prefix
    compare — reproducible across runs, partitionings, and engines. The
    whole operator is a scan-stage predicate plus one per-source
    aggregate; reweighting a 100 TB corpus is a config edit, not a code
    deploy."""
    weights = F.broadcast(
        spark.createDataFrame(_MIX_WEIGHTS, ["bucket", "thr"])
    )
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        (F.substring("source", 4, 10).cast("int") % 4).alias("bucket"),
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("source"))),
            1,
            2,
        ).alias("h"),
    )
    kept = F.col("h") < F.col("thr")
    return (
        d.join(weights, "bucket")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.count(F.when(kept, 1)).alias("n_sampled"),
            F.sum(F.when(kept, F.col("n_chars"))).cast("bigint").alias("sampled_chars"),
        )
    )


_CHUNK, _STRIDE = 32, 24


@register(
    "doc_chunk_overlap",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), x AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), s AS (
  SELECT doc_id, toks, unnest(range(0, n, {_STRIDE})) AS st FROM x
)
SELECT doc_id, st // {_STRIDE} AS chunk_idx,
       len(toks[st + 1 : st + {_CHUNK}]) AS n_tokens,
       md5(array_to_string(toks[st + 1 : st + {_CHUNK}], ' ')) AS chunk_md5
FROM s
""",
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking with overlap (size 32, stride 24 —
    8-token overlap): the training-window / RAG-passage generator. Chunk
    starts are a per-row ``sequence(0, n-1, stride)`` exploded map-side —
    fan-out without any shuffle, streaming through the scan stage. Each
    chunk is fingerprinted (md5 of its joined tokens) so downstream
    chunk-level dedup can key on a 16-byte hash instead of text."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.expr(f"sequence(0, n - 1, {_STRIDE})")).alias("st"),
        )
    )
    chunk = F.expr(f"slice(toks, st + 1, {_CHUNK})")
    return d.select(
        "doc_id",
        F.expr(f"st div {_STRIDE}").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


_SUBSPACES, _SUBDIM, _CODEBOOK = 4, 16, 8


@register(
    "simsearch_pq_assign",
    oracle=f"""
WITH c AS (
  SELECT vec_id AS c_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM embeddings WHERE vec_id < {_CODEBOOK}
), e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), terms AS (
  SELECT e.vec_id, s.m, c.c_id,
         list_reduce(list_transform(range(1, {_SUBDIM} + 1),
             i -> (e.v[s.m * {_SUBDIM} + i] - c.cvec[s.m * {_SUBDIM} + i])
                * (e.v[s.m * {_SUBDIM} + i] - c.cvec[s.m * {_SUBDIM} + i])),
           (x, y) -> x + y) AS d2
  FROM e
  CROSS JOIN c
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS s(m)
)
SELECT vec_id, m AS subspace, c_id AS code, ROUND(d2, 6) AS dist2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, c_id) rn
      FROM terms)
WHERE rn = 1
""",
)
def simsearch_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code assignment: split each 64-dim embedding
    into 4 subspaces of 16 dims; in each subspace pick the nearest of 8
    codewords (the first 8 embeddings as a deterministic codebook). The
    output (vec_id, subspace, code) IS the PQ compression — 4 small ints
    replacing 64 floats, the memory step behind billion-scale ANN.

    Codebooks broadcast; per-subspace squared-L2 folds strictly
    left-to-right in DOUBLE, with the oracle folding via list_reduce in
    the same element order — bit-identical values in both engines, no
    unordered SUM, no interpreted-BigDecimal tax (cf.
    simsearch_ivf_multiprobe). The argmin is min-of-(d2, c_id)-struct —
    a map-side-combinable aggregate, not a window sort."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    cent = F.broadcast(
        emb.filter(F.col("vec_id") < _CODEBOOK)
        .limit(_CODEBOOK)  # bounded codebook: provable loop-join build side
        .select(F.col("vec_id").alias("c_id"), F.col("v").alias("cvec"))
    )
    j = emb.crossJoin(cent)
    dist_cols = []
    for m in range(_SUBSPACES):
        lo = m * _SUBDIM + 1
        term = (
            f"zip_with(slice(v, {lo}, {_SUBDIM}), "
            f"slice(cvec, {lo}, {_SUBDIM}), (a, b) -> (a - b) * (a - b))"
        )
        fold = (
            f"aggregate({term}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        dist_cols.append(F.expr(fold).alias(f"d{m}"))
    j = j.select("vec_id", "c_id", *dist_cols)
    stack_args = ", ".join(f"{m}, d{m}" for m in range(_SUBSPACES))
    stacked = j.select(
        "vec_id",
        "c_id",
        F.expr(f"stack({_SUBSPACES}, {stack_args}) AS (m, d2)"),
    )
    return (
        stacked.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "c_id")).alias("best"))
        .select(
            "vec_id",
            F.col("m").alias("subspace"),
            F.col("best.c_id").alias("code"),
            F.round(F.col("best.d2"), 6).alias("dist2"),
        )
    )


@register(
    "dedup_normalized_text",
    oracle="""
WITH n AS (
  SELECT doc_id, n_chars,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
           AS norm_md5
  FROM documents
)
SELECT norm_md5, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keeper_id,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM n GROUP BY norm_md5
""",
)
def dedup_normalized_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization ("fuzzy-exact") dedup: lowercase, collapse every
    non-alphanumeric run to a single space, trim, hash — catching docs
    that differ only in case/punctuation/whitespace, the cheapest rung of
    the dedup ladder below MinHash. The shuffle key is the 16-byte norm
    hash, never the text; min(doc_id) elects a deterministic keeper."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.md5(
            F.trim(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
            )
        ).alias("norm_md5"),
    )
    return d.groupBy("norm_md5").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("keeper_id"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "text_rarity_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), freq AS (
  SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(1000000000 // f.freq) AS BIGINT) AS rarity_micro
FROM toks t JOIN freq f ON t.tok = f.tok
GROUP BY t.doc_id
""",
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rarity scoring (unigram-LM surprisal proxy): build the
    corpus token-frequency table with one aggregate, join it back on the
    token key, and score each doc by the sum of inverse frequencies —
    computed as integer micros (1e9 div freq) so the result is exact in
    any summation order and in both engines. High score = rare
    vocabulary; the cheap signal quality filters and mixture reweighting
    key on. Consecutive-space empty tokens count like any token,
    identically on both sides."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    return (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.expr("1000000000 div freq")).cast("bigint").alias("rarity_micro"),
        )
    )


# bucket (source number mod 4) -> fractional repeat factor (micro-units):
# 1.0x, 1.5x, 2.25x, 3.0x epochs — the Llama/Gopher-style mixture where
# high-quality domains are seen more than once per epoch.
_UPSAMPLE_MICRO = [(0, 1_000_000), (1, 1_500_000), (2, 2_250_000), (3, 3_000_000)]


@register(
    "sample_upsample_epochs",
    oracle="""
WITH d AS (
  SELECT doc_id, source, n_chars,
         CAST(substring(source, 4) AS INTEGER) % 4 AS bucket,
         CAST(('0x' || substring(md5('up:' || CAST(doc_id AS VARCHAR)), 1, 5))
              AS BIGINT) % 1000000 AS frac
  FROM documents
),
w AS (SELECT * FROM (VALUES (0, 1000000), (1, 1500000), (2, 2250000),
                            (3, 3000000)) AS t(bucket, micro)),
r AS (
  SELECT d.source, d.n_chars,
         (w.micro // 1000000)
           + CASE WHEN d.frac < (w.micro % 1000000) THEN 1 ELSE 0 END
           AS n_copies
  FROM d JOIN w ON d.bucket = w.bucket
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_copies) AS BIGINT) AS n_emitted,
       CAST(SUM(n_copies * n_chars) AS BIGINT) AS emitted_chars
FROM r GROUP BY source
""",
)
def sample_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional UPsampling (epochs-per-domain): each source family gets a
    repeat factor like 2.25× — every doc is emitted floor(f) times and one
    extra copy with probability frac(f), decided by an md5-derived
    per-doc fraction. Deterministic across runs/partitionings/engines (the
    complement of sample_weighted_mixture, which only downsamples), this is
    the Gopher/Llama-style mixture schedule where curated domains are seen
    multiple times per training epoch.

    Shape: broadcast 4-row factor relation joined in the scan stage; the
    actual emission is explode(sequence(1, n_copies)) — map-only fan-out,
    no shuffle until the reporting aggregate. The registered output is the
    per-source emission accounting (docs, emitted rows, emitted chars) so
    the check is compact; the exploded set itself is the intermediate."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        (F.expr("CAST(substring(source, 4) AS INT)") % 4).alias("bucket"),
        (
            F.expr(
                "CAST(conv(substring(md5(concat('up:', CAST(doc_id AS STRING))), 1, 5), 16, 10) AS BIGINT)"
            )
            % 1_000_000
        ).alias("frac"),
    )
    w = F.broadcast(
        spark.createDataFrame(_UPSAMPLE_MICRO, "bucket int, micro bigint")
    )
    r = d.join(w, "bucket").select(
        "source",
        "n_chars",
        (
            F.expr("micro div 1000000")
            + F.when(F.col("frac") < F.col("micro") % 1_000_000, 1).otherwise(0)
        ).alias("n_copies"),
    )
    return r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_copies").cast("bigint").alias("n_emitted"),
        F.sum(F.col("n_copies") * F.col("n_chars")).cast("bigint").alias(
            "emitted_chars"
        ),
    )


_MIX_TEMP = 0.7  # temperature < 1 flattens toward uniform (XLM-R style)


@register(
    "mixture_temperature_reweight",
    oracle=f"""
WITH c AS (
  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
  FROM documents GROUP BY source
),
t AS (
  SELECT source, n_docs, n_chars,
         exp(ln(n_docs * 1.0 / (SELECT SUM(n_docs) FROM c)) / {_MIX_TEMP}) AS u
  FROM c
),
z AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(u ORDER BY source)), (a, b) -> a + b) AS z
  FROM t
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_chars AS BIGINT) AS n_chars,
       ROUND(n_docs * 1.0 / (SELECT SUM(n_docs) FROM c), 6) AS p_raw,
       ROUND(u / z.z, 6) AS p_temp
FROM t, z
""",
)
def mixture_temperature_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture weights (the XLM-R / mT5 schedule):
    p_temp(d) ∝ p_raw(d)^(1/T) with T < 1 boosting low-resource domains.
    This is the step that TURNS corpus counts INTO the sampling config
    `sample_weighted_mixture` consumes.

    Shape: one per-domain count (map-side combinable), then scalar
    normalizers over the handful of domain rows — nothing here scales with
    |docs| after the first aggregate. p^(1/T) is computed as exp(ln(p)/T)
    identically in both engines and rounded to 6 dp (same libm-ULP
    discipline as the rarity/logprob scores). The sum-of-u normalizer is a
    source-ordered left-to-right fold (``aggregate`` ≙ ``list_reduce``) —
    cheap at domain cardinality, and it keeps even this tiny float sum
    merge-order-free."""
    c = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )
    tot = c.agg(F.sum("n_docs").alias("tot"))
    t = c.crossJoin(F.broadcast(tot)).withColumn(
        "u", F.exp(F.log(F.col("n_docs") * 1.0 / F.col("tot")) / _MIX_TEMP)
    )
    z = t.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(source, u))), "
            "CAST(0.0 AS DOUBLE), (acc, s) -> acc + s.u)"
        ).alias("z")
    )
    return (
        t.crossJoin(F.broadcast(z))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "n_chars",
            F.round(F.col("n_docs") * 1.0 / F.col("tot"), 6).alias("p_raw"),
            F.round(F.col("u") / F.col("z"), 6).alias("p_temp"),
        )
    )
