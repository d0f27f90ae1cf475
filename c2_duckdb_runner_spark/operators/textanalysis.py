"""Text-analysis operators over the ``documents`` fixture.

The LLM-pipeline north-star family: language ID, quality scoring, token
counting, fingerprinting, TF-IDF. Reached in the reference only through the
delegated SQL slot (``main.cc:181-182``); no per-operator reference code.

Everything is built-in ``pyspark.sql.functions`` expressions (whole-stage
codegen, no Python in the hot path). Per-doc ops are map-only — at 100 TB
they scan, compute, and write with zero shuffles; TF-IDF adds exactly two
shuffles (term df, per-doc window), both keyed on high-cardinality columns.

Oracle-parity notes (every query here has a DuckDB twin):
- DuckDB ``regexp_replace`` replaces only the FIRST match unless the ``'g'``
  flag is passed; Spark's always replaces all. Every oracle uses ``'g'``.
- Spark ``ascii()`` == DuckDB ``ord()`` (codepoint of first char).
- DuckDB ``list_reduce`` has no init value, so folds seed via
  ``list_prepend(0, ...)`` to mirror Spark's ``aggregate(..., 0, ...)``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load, load_spread

_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


@register(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INTEGER) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split + a BPE-ish regex lexer (letters /
    digits / single punctuation). Map-only; both counts stay JVM-side."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# Tiny stopword profiles; argmax with a fixed preference order on ties.
_PROFILES = {
    "en": ("the", "a", "of", "and", "value", "row"),
    "de": ("der", "die", "das", "und", "wert"),
    "fr": ("le", "la", "les", "et", "valeur"),
}


def _hits_spark(lang: str) -> F.Column:
    lst = ", ".join(f"'{w}'" for w in _PROFILES[lang])
    return F.expr(f"size(filter(toks, t -> t IN ({lst})))")


def _hits_duck(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _PROFILES[lang])
    return f"len(list_filter(toks, t -> t IN ({lst})))"


@register(
    "text_langid_ngram",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         {_hits_duck('en')} AS h_en,
         {_hits_duck('de')} AS h_de,
         {_hits_duck('fr')} AS h_fr,
         len(toks) AS n
  FROM t
)
SELECT doc_id,
       CASE WHEN h_en >= h_de AND h_en >= h_fr THEN 'en'
            WHEN h_de >= h_fr THEN 'de' ELSE 'fr' END AS pred_lang,
       ROUND(greatest(h_en, h_de, h_fr) * 1.0 / n, 6) AS confidence
FROM s
""",
)
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-profile hit rate (the classic n-gram/stopword
    heuristic, shrunk to 3 profiles). Fixed tie preference en > de > fr keeps
    the argmax deterministic across engines."""
    d = load(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    s = d.select(
        "doc_id",
        _hits_spark("en").alias("h_en"),
        _hits_spark("de").alias("h_de"),
        _hits_spark("fr").alias("h_fr"),
        F.size("toks").alias("n"),
    )
    pred = (
        F.when((F.col("h_en") >= F.col("h_de")) & (F.col("h_en") >= F.col("h_fr")), "en")
        .when(F.col("h_de") >= F.col("h_fr"), "de")
        .otherwise("fr")
    )
    conf = F.round(F.greatest("h_en", "h_de", "h_fr") * 1.0 / F.col("n"), 6)
    return s.select("doc_id", pred.alias("pred_lang"), conf.alias("confidence"))


_STOPS = "'the', 'a', 'of', 'and', 'to', 'in', 'value', 'row', 'table'"


@register(
    "text_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         length(text) AS nc,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       ROUND(nc * 1.0 / len(toks), 6) AS avg_tok_len,
       ROUND(n_punct * 1.0 / nc, 6) AS punct_ratio,
       ROUND(n_upper * 1.0 / nc, 6) AS upper_ratio,
       ROUND(len(list_filter(toks, t -> t IN ({_STOPS}))) * 1.0 / len(toks), 6)
         AS stop_ratio,
       ROUND(1.0 / (1.0 + exp(-(
           0.02 * (nc * 1.0 / len(toks))
         - 4.0 * (n_punct * 1.0 / nc)
         + 2.0 * (len(list_filter(toks, t -> t IN ({_STOPS}))) * 1.0 / len(toks))
       ))), 6) AS quality
FROM t
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: token/char stats, punctuation & uppercase ratios,
    stopword rate, squashed into a logistic quality score. Pure map-side
    expression work — the 100 TB shape is scan → compute → write."""
    d = (
        load(spark, sf_dir, "documents")
        .withColumn("toks", F.split("text", " "))
        .withColumn("nc", F.length("text"))
        .withColumn(
            "n_punct",
            F.length("text") - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", "")),
        )
        .withColumn(
            "n_upper",
            F.length("text") - F.length(F.regexp_replace("text", "[A-Z]", "")),
        )
        .withColumn("nt", F.size("toks"))
        .withColumn(
            "n_stop", F.expr(f"size(filter(toks, t -> t IN ({_STOPS})))")
        )
    )
    # try_divide: an empty hostile document has nc = 0, where ANSI x/0
    # ERRORS but DuckDB yields NULL — NULL-on-/0 is the pinned semantics
    avg_tok = F.try_divide(F.col("nc") * 1.0, F.col("nt"))
    punct = F.try_divide(F.col("n_punct") * 1.0, F.col("nc"))
    stop = F.try_divide(F.col("n_stop") * 1.0, F.col("nt"))
    quality = 1.0 / (1.0 + F.exp(-(0.02 * avg_tok - 4.0 * punct + 2.0 * stop)))
    return d.select(
        "doc_id",
        F.col("nt").alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_tok_len"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(F.try_divide(F.col("n_upper") * 1.0, F.col("nc")), 6)
        .alias("upper_ratio"),
        F.round(stop, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


_MOD = 1_000_000_007


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           [CAST(ord(text[i]) AS BIGINT) FOR i IN range(1, least(length(text), 64) + 1)]),
         (acc, c) -> (acc * 31 + c) % {_MOD}) AS fp
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: rolling 31-base polynomial hash of the first 64
    chars, mod 1e9+7 — engine-agnostic (unlike xxhash64) so the oracle can
    replay it bit-for-bit. Map-only."""
    d = load(spark, sf_dir, "documents")
    fp = F.expr(
        "aggregate(sequence(1, least(length(text), 64)), CAST(0 AS BIGINT), "
        f"(acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % {_MOD})"
    )
    return d.select("doc_id", fp.alias("fp"))


@register(
    "text_tfidf_topterms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= 3
""",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document. Two shuffles total: term→df agg and
    the per-doc window; the df side is small (vocabulary) so Catalyst
    broadcast-joins it back. Rank on the ROUNDED score with a term tiebreak
    so cross-engine ln() ulp noise can't flip the ordering."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = load(spark, sf_dir, "documents").count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
    )


@register(
    "bpe_pair_counts",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), pairs AS (
  SELECT toks[CAST(i AS INTEGER)] AS a, toks[CAST(i AS INTEGER) + 1] AS b
  FROM t, unnest(range(1, len(toks))) AS u(i)
)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs GROUP BY a, b
ORDER BY cnt DESC, a, b LIMIT 20
""",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration: count ADJACENT token pairs across the
    corpus and rank the merge candidates — the inner loop of byte-pair
    tokenizer training. Adjacent pairing is arrays_zip of the array with
    its own 1-shifted slice (map-side, no self-join); the top-20 rides
    TakeOrderedAndProject with a (count, pair) total order so ties are
    deterministic. At 100 TB each iteration is one scan + one
    (a, b)-keyed aggregate — the shape that makes distributed BPE
    training feasible."""
    d = load(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("toks")
    )
    pairs = d.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(toks, 1, size(toks) - 1)"),
                F.expr("slice(toks, 2, size(toks) - 1)"),
            )
        ).alias("p")
    ).select(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(20)
    )


@register(
    "text_entropy_score",
    oracle="""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
f AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(ln(SUM(c))
             - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(list(c ORDER BY tok), x -> x * ln(x))),
                 (a, b) -> a + b)
               / SUM(c), 6) AS token_entropy
FROM f GROUP BY doc_id
""",
)
def text_entropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per doc — the gibberish/boilerplate
    detector quality pipelines pair with the rule-based scores: near-zero
    entropy means one token repeated (spam/padding), unusually high means
    token soup; both get filtered before training.

    H = -Σ(c/T)·ln(c/T) computed via the algebraic identity
    ln(T) - Σ c·ln(c) / T so the whole thing is ONE explode + one
    (doc_id, tok) count + one per-doc aggregate — two keyed shuffles, both
    map-side-combinable, no window pass (the naive per-token p·ln(p) needs
    T joined back or a window). Determinism: Σ c·ln(c) is NOT computed as a
    floating SUM (partial-merge order varies by engine and run) but as a
    left-to-right fold over the per-doc counts in token order —
    ``aggregate`` ≙ ``list_reduce`` with a 0.0 seed, the same bit-identical
    ordered-fold contract the simsearch distances use. Per-doc distinct
    tokens are bounded by doc length, so the collected array is per-row
    state, not corpus state — safe at 100 TB. Both engines round to 6 dp."""
    t = load_spread(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    f = t.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return (
        f.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.sort_array(
                F.collect_list(F.struct(F.col("tok"), F.col("c")))
            ).alias("arr"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(
                F.log("n_tokens")
                - F.expr(
                    "aggregate(arr, CAST(0.0 AS DOUBLE), "
                    "(acc, s) -> acc + s.c * ln(s.c))"
                )
                / F.col("n_tokens"),
                6,
            ).alias("token_entropy"),
        )
    )


@register(
    "text_bigram_logprob",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS (
  SELECT doc_id, t[i] AS a, t[i+1] AS b
  FROM toks CROSS JOIN UNNEST(range(1, greatest(len(t), 1))) AS u(i)
),
c_ab AS (SELECT a, b, COUNT(*) AS nab FROM bg GROUP BY a, b),
c_a AS (SELECT a, COUNT(*) AS na FROM bg GROUP BY a)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lp ORDER BY lp)), (x, y) -> x + y)
             / COUNT(*), 6) AS avg_logprob
FROM (
  SELECT bg.doc_id AS doc_id, ln(c_ab.nab * 1.0 / c_a.na) AS lp
  FROM bg JOIN c_ab ON c_ab.a = bg.a AND c_ab.b = bg.b
          JOIN c_a ON c_a.a = bg.a
) GROUP BY doc_id
""",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram language-model score per doc — the perplexity-filter
    stand-in (CCNet-style): train bigram counts ON the corpus itself in one
    pass, then score each document by its mean ln P(b|a) = ln(c_ab/c_a).
    Documents full of corpus-typical transitions score high; token soup and
    boilerplate-with-rare-joins score low. With a real KenLM the UDF slot
    changes; the join/aggregate shape below is exactly what survives.

    Shape: one adjacent-pair explode (map-side arrays_zip, no self-join),
    two grouped counts (the 'LM'), then the doc pairs re-join the two count
    tables on their keys and fold per doc. Every shuffle is keyed on
    bigram/unigram/doc_id; at 100 TB the count tables are the small side
    (|vocab|², capped) and broadcast. Determinism: the per-doc Σ ln(p) is a
    value-sorted left-to-right fold (``aggregate`` ≙ ``list_reduce``, 0.0
    seed), not a merge-order-dependent floating SUM; per-doc bigram counts
    are bounded by doc length so the collected array is per-row state. Both
    engines round the mean to 6 dp."""
    toks = load_spread(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)"),
                F.expr("slice(t, 2, size(t) - 1)"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.0").alias("a"), F.col("p.1").alias("b"))
    c_ab = bg.groupBy("a", "b").agg(F.count("*").alias("nab"))
    c_a = bg.groupBy("a").agg(F.count("*").alias("na"))
    return (
        bg.join(c_ab, ["a", "b"])
        .join(c_a, ["a"])
        .select("doc_id", F.log(F.col("nab") * 1.0 / F.col("na")).alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sort_array(F.collect_list("lp")).alias("lps"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.expr(
                    "aggregate(lps, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
                )
                / F.col("n_bigrams"),
                6,
            ).alias("avg_logprob"),
        )
    )


# --- BPE merge application (the encode side of bpe_pair_counts) -----------

# Ranked merge table (the artifact bpe_pair_counts trains): applied in rank
# order, each merge rewriting the token stream before the next sees it —
# exactly how a BPE tokenizer consumes its merges file. Pairs are a != b,
# which makes each round ORDER-FREE: a match at i requires t[i]=a, t[i+1]=b,
# so two matches can never overlap (t[i+1] would have to be both a and b),
# and greedy left-to-right equals "take every match" — one pure map over
# positions, no sequential fold, no Python. (Equal-token pairs like
# ("the","the") need run-parity handling and are deliberately excluded;
# production merge tables rarely rank them first.)
_BPE_MERGES = [
    ("table", "hash"),
    ("part", "filter"),
    ("slow", "key"),
    ("merge", "group"),
]


def _bpe_round_spark(arr: str, a: str, b: str) -> str:
    m = f"{a}_{b}"
    return (
        f"filter(transform(sequence(1, size({arr})), i -> "
        f"CASE WHEN element_at({arr}, i) = '{a}' AND i < size({arr}) "
        f"AND element_at({arr}, i + 1) = '{b}' THEN '{m}' "
        f"WHEN i > 1 AND element_at({arr}, i - 1) = '{a}' "
        f"AND element_at({arr}, i) = '{b}' THEN NULL "
        f"ELSE element_at({arr}, i) END), x -> x IS NOT NULL)"
    )


def _bpe_round_duck(arr: str, a: str, b: str) -> str:
    m = f"{a}_{b}"
    return (
        f"list_filter(list_transform(range(1, len({arr}) + 1), i -> "
        f"CASE WHEN {arr}[i] = '{a}' AND i < len({arr}) "
        f"AND {arr}[i + 1] = '{b}' THEN '{m}' "
        f"WHEN i > 1 AND {arr}[i - 1] = '{a}' "
        f"AND {arr}[i] = '{b}' THEN NULL "
        f"ELSE {arr}[i] END), x -> x IS NOT NULL)"
    )


def _bpe_chain_duck_ctes() -> str:
    """Chained MATERIALIZED CTEs, one per merge round. Nesting rounds as a
    single expression would copy the inner round ~6x per level (each round
    references its input array six times) — a 6^k textual/compute blowup;
    per-round materialization keeps both engines linear in k."""
    ctes = ["t AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS m0 FROM documents)"]
    for r, (a, b) in enumerate(_BPE_MERGES, start=1):
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT doc_id, "
            f"{_bpe_round_duck(f'm{r-1}', a, b)} AS m{r} FROM s{r-1})"
            if r > 1
            else f"s1 AS MATERIALIZED (SELECT doc_id, "
            f"{_bpe_round_duck('m0', a, b)} AS m1 FROM t)"
        )
    return ",\n".join(ctes)


_BPE_K = len(_BPE_MERGES)


@register(
    "bpe_apply_merges",
    oracle=f"""
WITH {_bpe_chain_duck_ctes()},
n0 AS (SELECT doc_id, len(m0) AS n_before FROM t)
SELECT s.doc_id AS doc_id, CAST(n0.n_before AS BIGINT) AS n_before,
       CAST(len(s.m{_BPE_K}) AS BIGINT) AS n_after,
       CAST(n0.n_before - len(s.m{_BPE_K}) AS BIGINT) AS n_merged,
       array_to_string(s.m{_BPE_K}[1:8], ' ') AS head_tokens
FROM s{_BPE_K} s JOIN n0 ON n0.doc_id = s.doc_id
""",
)
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer ENCODE step: apply the ranked BPE merge table to every
    document — the map that turns a trained merges file
    (``bpe_pair_counts``) into tokenized training data.

    Scale shape: zero shuffle — k merge rounds are k successive map-only
    array rewrites (at production vocab sizes the table would broadcast
    and the rounds run inside a pandas UDF; same topology). Each round is
    exact in both engines because a != b makes greedy left-to-right
    merging order-free: a match at i needs t[i]=a, t[i+1]=b, so matches
    can never overlap and "take every match" equals the sequential scan.
    Rounds are materialized one per projection/CTE — nesting them into a
    single expression would duplicate the inner round ~6x per level (6^k
    codegen blowup, measured as a 4.7 MiB task binary at k=4). The oracle
    replays the identical chain; n_before/n_after/n_merged and the head
    of each tokenized doc are hash-compared."""
    df = load_spread(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.split("text", " ").alias("m0")
    )
    for r, (a, b) in enumerate(_BPE_MERGES, start=1):
        df = df.withColumn(f"m{r}", F.expr(_bpe_round_spark(f"m{r-1}", a, b)))
    last = f"m{_BPE_K}"
    return df.select(
        "doc_id",
        F.size("m0").cast("bigint").alias("n_before"),
        F.size(last).cast("bigint").alias("n_after"),
        (F.size("m0") - F.size(last)).cast("bigint").alias("n_merged"),
        F.array_join(F.slice(last, 1, 8), " ").alias("head_tokens"),
    )


@register(
    "text_normalize_nfc",
    oracle="""
SELECT doc_id,
       nfc_normalize(text || ' cafe' || chr(769) || ' ' || chr(8490))
         AS norm_text,
       length(nfc_normalize(text || ' cafe' || chr(769) || ' ' || chr(8490)))
         AS norm_len,
       (nfc_normalize(text || ' cafe' || chr(769) || ' ' || chr(8490))
        = (text || ' cafe' || chr(769) || ' ' || chr(8490))) AS was_nfc
FROM documents
""",
)
def text_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the step exact dedup silently REQUIRES:
    'café' composed (U+00E9) and decomposed (e + U+0301) are different
    byte strings with identical rendering, so un-normalized corpora leak
    visual duplicates straight past sha2 dedup. The fixture text is ASCII,
    so each doc gets a deterministic decomposed suffix planted in-query
    (combining acute + the Kelvin sign K, which NFC maps to plain 'K') —
    the normalizer must compose/fold exactly per UAX#15 in both engines
    (Python unicodedata here, DuckDB's utf8proc-backed nfc_normalize in
    the oracle; two independent implementations agreeing character-for-
    character is the strongest check available).

    Spark has no built-in normalizer, so this is a legitimate pandas UDF:
    Arrow-batched, one str.normalize pass per batch, map-only — the
    canonical 'small Python gap in a JVM pipeline' shape."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:  # noqa: F821 (resolved eagerly)
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        )

    planted = F.concat(
        # decomposed suffix spelled as escapes so no editor/encoding pass
        # can silently re-compose it: COMBINING ACUTE + KELVIN SIGN
        F.col("text"), F.lit(" cafe\u0301 \u212a")
    )
    d = load(spark, sf_dir, "documents").select(
        "doc_id", planted.alias("raw")
    )
    return d.select(
        "doc_id",
        nfc(F.col("raw")).alias("norm_text"),
        F.length(nfc(F.col("raw"))).alias("norm_len"),
        (nfc(F.col("raw")) == F.col("raw")).alias("was_nfc"),
    )
