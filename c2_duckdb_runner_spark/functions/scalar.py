"""Scalar function families (SURVEY.md §2 fn_string/date/math/conditional/
cast/hash) — all reachable through the reference's delegated SQL slot
(``main.cc:181-182``), all built-in JVM-side expressions here (whole-stage
codegen; zero Python in the hot path).

Cross-engine alignment notes baked into each oracle:
- DuckDB ``year()`` returns BIGINT, Spark INT → oracle casts;
- DuckDB ``dayofweek`` is 0=Sunday, Spark 1=Sunday → oracle adds 1;
- ``round`` on exact .x5 money values diverges (binary-double vs BigDecimal
  rounding) → round only applied to non-terminating values (sqrt/ln) at 6dp;
- libm ulp drift (pow/ln/log10 across JVM vs C++) masked by round(...,6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "fn_string",
    oracle=(
        "SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg, "
        "substr(c_name, 1, 8) AS prefix, length(c_name) AS name_len, "
        "concat(c_name, ':', c_mktsegment) AS joined, "
        "lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key, "
        "trim('  x  ') AS trimmed, replace(c_name, 'Customer', 'Cust') AS replaced, "
        "instr(c_name, '#') AS hash_pos, reverse(c_mktsegment) AS rseg, "
        "repeat(c_mktsegment, 2) AS seg2 "
        "FROM customer"
    ),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string function family (upper/substr/length/trim/concat/...),
    all JVM-side whole-stage-codegen expressions."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("replaced"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg2"),
    )


@register(
    "fn_string_split",
    oracle=(
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
        "string_split(text, ' ')[1] AS first_token "
        "FROM documents"
    ),
)
def fn_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → array; Spark split() is regex-based but a single space is the
    same delimiter DuckDB's non-regex string_split uses."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
    )


@register(
    "fn_regex",
    oracle=(
        "SELECT p_partkey, regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num, "
        "regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled, "
        "regexp_matches(p_type, 'PROMO|STANDARD') AS is_common "
        "FROM part"
    ),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex trio — patterns kept to the Java∩RE2 shared dialect. Note
    DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("PROMO|STANDARD").alias("is_common"),
    )


@register(
    "fn_date",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(year(o_orderdate) AS INTEGER) AS yr, "
        "CAST(month(o_orderdate) AS INTEGER) AS mth, "
        "CAST(day(o_orderdate) AS INTEGER) AS dom, "
        "CAST(dayofweek(o_orderdate) AS INTEGER) + 1 AS dow, "
        "date_trunc('month', o_orderdate) AS month_start, "
        "CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date, "
        "CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)"
        " AS days_since_95, "
        "epoch_ms(o_orderdate) AS order_ms, "
        "strftime(o_orderdate, '%Y-%m') AS ym "
        "FROM orders"
    ),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. Oracle-side casts pin DuckDB's BIGINT extracts to
    Spark's INT, 0-based dow to Spark's 1-based, strftime to date_format."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # DATE-typed outputs are avoided engine-wide: Spark hands dates to
        # pandas as datetime.date while DuckDB hands datetime64 — a false
        # mismatch in any value-hash. String form is unambiguous.
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias(
            "due_date"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_95"
        ),
        # unix_millis rejects TIMESTAMP_NTZ; session TZ is pinned UTC so the
        # NTZ->TZ cast keeps the wall-clock == DuckDB's epoch_ms semantics.
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("order_ms"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "fn_math",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "abs(l_quantity - 25) AS dist25, "
        "CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k, "
        "CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct, "
        "round(sqrt(l_extendedprice), 6) AS root_price, "
        "round(ln(l_extendedprice), 6) AS ln_price, "
        "round(log10(l_extendedprice), 6) AS log_price, "
        "round(pow(l_quantity, 1.5), 6) AS qty_pow, "
        "greatest(l_discount, l_tax) AS max_rate, "
        "least(l_discount, l_tax) AS min_rate, "
        "CAST(l_orderkey % 7 AS BIGINT) AS key_mod, "
        "CAST(sign(l_quantity - 25) AS DOUBLE) AS qty_sign "
        "FROM lineitem"
    ),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core math function family (abs/round/floor/sqrt/pow/...) over
    lineitem numerics; decimal-routed where the oracle hash needs it."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("dist25"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("root_price"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log_price"),
        F.round(F.pow(F.col("l_quantity"), 1.5), 6).alias("qty_pow"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_quantity") - 25).alias("qty_sign"),
    )


@register(
    "fn_conditional",
    oracle=(
        "SELECT o_orderkey, "
        "CASE WHEN o_totalprice > 150000 THEN 'high' "
        "     WHEN o_totalprice > 50000 THEN 'mid' ELSE 'low' END AS price_band, "
        "coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label, "
        "CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END AS urgent_price "
        "FROM orders"
    ),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif conditional family (fn_conditional
    in SURVEY §2)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).alias(
            "urgent_price"
        ),
    )


@register(
    "fn_cast",
    oracle=(
        "SELECT l_orderkey, "
        "CAST(l_quantity AS INTEGER) AS qty_int, "
        "CAST(l_orderkey AS VARCHAR) AS key_str, "
        "CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip, "
        "CAST(l_linenumber AS DOUBLE) AS line_dbl, "
        "CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date, "
        "CAST(CAST('1995-06-17' AS DATE) AS VARCHAR) AS const_date "
        "FROM lineitem"
    ),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast lattice (ANSI-safe values only — Spark 4 runs ANSI mode by
    default, matching DuckDB's error-on-bad-cast; the SURVEY §2 fn_cast
    semantic gap is thereby closed rather than configured around)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_date"),
        F.lit("1995-06-17").cast("date").cast("string").alias("const_date"),
    )


@register(
    "fn_hash",
    oracle=(
        "SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256 "
        "FROM customer"
    ),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests — the portable content-hash primitives used by
    the exact-dedup operators (both engines emit lowercase hex)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@register(
    "fn_trig",
    oracle="""
SELECT p_partkey,
       ROUND(sin(p_retailprice / 100.0), 6) AS sin_x,
       ROUND(cos(p_retailprice / 100.0), 6) AS cos_x,
       ROUND(atan2(CAST(p_size AS DOUBLE), p_retailprice / 100.0), 6) AS bearing,
       ROUND(degrees(atan2(CAST(p_size AS DOUBLE), p_retailprice / 100.0)), 6)
         AS bearing_deg,
       ROUND(pi(), 6) AS pi_const
FROM part
""",
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric scalar functions (sin/cos/atan2/degrees/pi) — pure
    codegen projections; results rounded to 6 so cross-libm ulp noise
    can't touch the hash."""
    p = load(spark, sf_dir, "part")
    x = F.col("p_retailprice") / 100.0
    y = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.round(F.sin(x), 6).alias("sin_x"),
        F.round(F.cos(x), 6).alias("cos_x"),
        F.round(F.atan2(y, x), 6).alias("bearing"),
        F.round(F.degrees(F.atan2(y, x)), 6).alias("bearing_deg"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_const"),
    )


@register(
    "fn_bit_ops",
    oracle="""
SELECT o_orderkey,
       o_orderkey << 3 AS shl,
       o_orderkey >> 2 AS shr,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 21845) AS toggled,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
""",
)
def fn_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar operators (shifts, and/or/xor, popcount) on int64
    keys — the building blocks of hash/bucket/bloom arithmetic, all
    whole-stage-codegen projections."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("toggled"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "fn_collation_lcase",
    oracle="""
WITH m AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS s,
         n_chars
  FROM documents
)
SELECT lower(s) AS src_ci, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM m GROUP BY lower(s)
""",
)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 collations: the source column
    is deliberately case-mangled, then grouped under UTF8_LCASE — the
    collation-aware hash groups 'SRC1' with 'src1' without rewriting the
    data (the oracle spells the same semantics as lower()). The emitted
    key is pinned to min(lower(s)) because a collation group's
    representative value is otherwise an arbitrary case variant."""
    d = load(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("s"),
        "n_chars",
    )
    return (
        d.groupBy(F.expr("collate(s, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.min(F.lower(F.col("s"))).alias("src_ci"),
            F.count("*").alias("n"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select("src_ci", "n", "total_chars")
    )


@register(
    "fn_url_parse",
    oracle="""
WITH s AS (
  SELECT doc_id,
         NULLIF(regexp_replace(lower(source), '[^a-z0-9]', '', 'g'), '')
           AS src,
         NULLIF(regexp_replace(lower(lang), '[^a-z0-9]', '', 'g'), '')
           AS lg,
         n_chars
  FROM documents
)
SELECT doc_id,
       CASE WHEN lg IS NOT NULL AND n_chars IS NOT NULL
            THEN src || '.example.org' END AS host,
       CASE WHEN src IS NOT NULL AND lg IS NOT NULL AND n_chars IS NOT NULL
            THEN '/docs/' || CAST(doc_id AS VARCHAR) END AS path,
       CASE WHEN src IS NOT NULL AND n_chars IS NOT NULL THEN lg END
         AS qlang,
       CASE WHEN src IS NOT NULL AND lg IS NOT NULL
            THEN CAST(n_chars AS VARCHAR) END AS qn
FROM s
""",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the JVM-side ``parse_url`` expression: a
    deterministic URL is synthesized per document, then HOST / PATH /
    per-key QUERY components are parsed back out. The oracle spells the
    expected components by construction, so this differentially proves
    Spark's parser re-derives exactly the inputs (no UDF, codegen-friendly;
    the delegated-SQL slot at reference main.cc:164-169 admits the same
    string surface).

    Hostile hardening (r11): free-form strings can make the synthesized
    URL unparseable (spaces, '&', non-ASCII — Spark's ANSI parse_url then
    ERRORS where the by-construction oracle still emits components), so
    both sides sanitize source/lang to [a-z0-9] and NULL-out empties
    first; a NULL component NULLs the whole URL via concat, and the
    oracle mirrors that propagation per output column."""
    d = load(spark, sf_dir, "documents")
    src = F.expr("NULLIF(regexp_replace(lower(source), '[^a-z0-9]', ''), '')")
    lg = F.expr("NULLIF(regexp_replace(lower(lang), '[^a-z0-9]', ''), '')")
    url = F.concat(
        F.lit("https://"),
        src,
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        lg,
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    u = d.select("doc_id", url.alias("u"))
    return u.select(
        "doc_id",
        F.parse_url("u", F.lit("HOST")).alias("host"),
        F.parse_url("u", F.lit("PATH")).alias("path"),
        F.parse_url("u", F.lit("QUERY"), F.lit("lang")).alias("qlang"),
        F.parse_url("u", F.lit("QUERY"), F.lit("n")).alias("qn"),
    )


@register(
    "fn_try_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(CASE WHEN l_linenumber = 3 THEN NULL
                  ELSE l_orderkey / (l_linenumber - 3) END, 6) + 0.0
         AS safe_div,
       TRY_CAST(CASE WHEN l_orderkey % 3 = 0 THEN CAST(l_orderkey AS VARCHAR)
                     ELSE 'x' || CAST(l_orderkey AS VARCHAR) END AS BIGINT)
         AS parsed,
       CAST(NULL AS BIGINT) AS overflowed
FROM lineitem
""",
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ``try_*`` arithmetic (Spark 4 runs ANSI mode by default:
    bad casts raise like DuckDB, while bare division-by-zero raises where
    DuckDB yields NULL — tests/test_properties.py pins the exact gap; the
    try_ forms are the portable bridge): try_divide yields NULL at
    the l_linenumber=3 pole, try_cast NULLs the non-numeric strings, and
    try_add overflows BIGINT max to NULL (l_orderkey+1 is ≥1 for every
    row, so the overflow is total; the oracle states that constant-NULL
    consequence directly)."""
    li = load(spark, sf_dir, "lineitem")
    s = F.when(
        F.col("l_orderkey") % 3 == 0, F.col("l_orderkey").cast("string")
    ).otherwise(F.concat(F.lit("x"), F.col("l_orderkey").cast("string")))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_orderkey"), F.col("l_linenumber") - F.lit(3)), 6
        ).alias("safe_div"),
        s.try_cast("bigint").alias("parsed"),
        F.try_add(F.col("l_orderkey") + F.lit(1), F.lit(9223372036854775807)).alias(
            "overflowed"
        ),
    )


@register(
    "fn_timezone_convert",
    oracle="""
SELECT o_orderkey,
       strftime(timezone('America/New_York', o_orderdate),
                '%Y-%m-%d %H:%M:%S') AS utc_from_ny,
       strftime(timezone('Asia/Kolkata', o_orderdate),
                '%Y-%m-%d %H:%M:%S') AS utc_from_kolkata
FROM orders
""",
)
def fn_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DST-aware timezone conversion: each order's wall-clock timestamp is
    re-interpreted as New York local (DST shifts the offset 4↔5 h across
    the fixture's date span) and as Kolkata local (fixed +5:30, exercising
    non-whole-hour offsets), then expressed in UTC. Spark's
    convert_timezone on TIMESTAMP_NTZ is the instant-preserving path;
    DuckDB's timezone() is the same operation, with the session pinned to
    UTC so formatting agrees. Output is a formatted string — timestamp
    wire types (NTZ vs instant) differ across engines, wall-clock text
    does not."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("timestamp_ntz").alias("ts")
    )
    return o.select(
        "o_orderkey",
        F.date_format(
            F.convert_timezone(F.lit("America/New_York"), F.lit("UTC"), F.col("ts")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("utc_from_ny"),
        F.date_format(
            F.convert_timezone(F.lit("Asia/Kolkata"), F.lit("UTC"), F.col("ts")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("utc_from_kolkata"),
    )


@register(
    "fn_printf_format",
    oracle="""
SELECT c_custkey,
       printf('%s#%08d', c_mktsegment, c_custkey) AS tag,
       CASE WHEN isfinite(c_acctbal) AND abs(c_acctbal) <= 1e15
            THEN printf('%.2f', c_acctbal + 0.0) END AS bal_txt,
       printf('%x', c_custkey) AS key_hex
FROM customer
""",
)
def fn_printf_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting (Spark format_string ≙ DuckDB printf): both
    engines delegate to C-style format specs, so width/zero-pad/precision/
    hex render identically. %.2f on an exact 2-decimal monetary double is
    deterministic (no rounding ambiguity at binary midpoints because the
    fixture generates 2-decimal values)."""
    c = load(spark, sf_dir, "customer")
    # NULL pin (r11 hostile): DuckDB printf(NULL,...) is NULL, Spark
    # format_string renders the literal text "null" — NULL-propagation is
    # the declared semantics
    tag = F.when(
        F.col("c_mktsegment").isNotNull(),
        F.format_string("%s#%08d", F.col("c_mktsegment"), F.col("c_custkey")),
    )
    # finite, |x| <= 1e15, (-0.0 + 0.0) normalized: the engines disagree
    # on non-finite spellings ('NaN'/'Infinity' vs 'nan'/'inf'), the
    # -0.0 sign, AND huge magnitudes (Java %f prints the double's
    # shortest repr zero-padded, C prints the exact binary expansion —
    # 1e308 renders differently); inside ±1e15 the roundings agree
    bal = F.when(
        F.expr("c_acctbal IS NOT NULL AND NOT isnan(c_acctbal) "
               "AND abs(c_acctbal) <= 1e15"),
        F.format_string("%.2f", F.col("c_acctbal") + F.lit(0.0)),
    )
    return c.select(
        "c_custkey",
        tag.alias("tag"),
        bal.alias("bal_txt"),
        F.format_string("%x", F.col("c_custkey")).alias("key_hex"),
    )


_AES_KEY = "0123456789abcdef"  # 16-byte demo key; production keys arrive via conf


@register(
    "fn_aes_roundtrip",
    # DuckDB has no AES functions, so the oracle states the roundtrip LAW
    # the Spark side must prove: decrypt(encrypt(x, k), k) = x (verified
    # value-by-value — the restored plaintext column is hash-matched) and
    # a wrong-key decrypt NEVER restores the plaintext. The original law
    # ("wrong key yields NULL") was only STATISTICALLY true — ECB+PKCS7
    # wrong-key decryption produces valid padding with probability ~1/256
    # per row, invisible at 150 fixture rows but ~586 expected hits at the
    # 150k-customer 100x replica, where the r9 sweep caught it. The exact
    # law (plaintext never restored, P ~ 2^-128) replaces it.
    oracle=(
        "SELECT c_custkey, c_name AS restored_name, "
        "CAST(1 AS INT) AS roundtrip_ok, CAST(1 AS INT) AS wrong_key_safe "
        "FROM customer"
    ),
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round-trip — the governance primitive for
    PII columns at rest (encrypt on ingest, decrypt in the trusted zone):
    aes_encrypt in ECB mode (deterministic: same key+plaintext → same
    ciphertext, which is what makes encrypted columns still joinable /
    groupable when required; GCM is the right mode when determinism is NOT
    wanted), aes_decrypt back, and try_aes_decrypt under a wrong key
    proving failure is NULL-safe, not a job-killer. All JVM-side codegen
    expressions — zero Python, map-only at any scale."""
    c = load(spark, sf_dir, "customer")
    dec = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(c_name, '{_AES_KEY}', 'ECB'), "
        f"'{_AES_KEY}', 'ECB') AS STRING)"
    )
    wrong = F.expr(
        f"CAST(try_aes_decrypt(aes_encrypt(c_name, '{_AES_KEY}', 'ECB'), "
        f"'fedcba9876543210', 'ECB') AS STRING)"
    )
    return c.select(
        "c_custkey",
        dec.alias("restored_name"),
        (dec == F.col("c_name")).cast("int").alias("roundtrip_ok"),
        # NULL (padding rejected) or garbage both count as safe; only
        # restoring the true plaintext under the wrong key would fail
        (~wrong.eqNullSafe(F.col("c_name"))).cast("int").alias(
            "wrong_key_safe"
        ),
    )
