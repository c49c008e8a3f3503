"""Scalar function coverage (SURVEY §2B): string, date/time, math, array,
map, JSON, conditional, and hash functions.

Reference parity: the reference computes scalars in opaque Python per item
(the canonical doc example is ``math.pow(idx, 2)``, reference
docs/index.rst:56-63). Every function here is a built-in Catalyst expression:
JVM-side, whole-stage-codegen'd, null-safe — never a Python UDF.

Cross-engine notes (documented divergences handled in the oracles):
- dayofweek: Spark is 1=Sunday..7; DuckDB 0=Sunday..6 → oracle adds 1.
- transcendentals (pow/ln/log10) are libm-dependent in the last bit → both
  sides round to 6 decimals.
- per-row +,-,*,/ and sqrt are IEEE-exact → compared raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bert_etl_spark.functions.deterministic import dsum, sql_dsum
from bert_etl_spark.operators.registry import query, tbl


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           string_split(p_name, ' ')[1] AS first_word,
           substring(p_brand, 7) AS brand_num,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_digits,
           replace(p_type, 'ECONOMY', 'ECO') AS type_short,
           concat_ws('/', p_brand, p_type) AS brand_type,
           levenshtein(p_type, 'ECONOMY') AS dist_economy,
           strpos(p_name, ' ') AS space_pos,
           trim(('  ' || p_name || ' ')) AS trimmed
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.substring(F.col("p_brand"), 7, 1000).alias("brand_num"),
        F.regexp_extract(F.col("p_brand"), r"([0-9]+)", 1).alias("brand_digits"),
        F.regexp_replace(F.col("p_type"), "ECONOMY", "ECO").alias("type_short"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.levenshtein(F.col("p_type"), F.lit("ECONOMY")).cast("long").alias("dist_economy"),
        F.instr(F.col("p_name"), " ").cast("long").alias("space_pos"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           dayofmonth(o_orderdate) AS order_day,
           dayofweek(o_orderdate) + 1 AS order_dow,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS order_quarter,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           o_orderdate + INTERVAL '90 days' AS due_date,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.dayofweek("o_orderdate").cast("long").alias("order_dow"),
        F.date_trunc("quarter", "o_orderdate").alias("order_quarter"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_95"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(pow(l_quantity, 2), 6) AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           ROUND(ln(l_quantity), 6) AS qty_ln,
           ROUND(log10(l_extendedprice), 6) AS price_log10,
           round(l_extendedprice, 1) AS price_round,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_floor,
           CAST(l_linenumber % 3 AS BIGINT) AS line_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference's canonical transform is math.pow(idx, 2) (docs/index.rst:56-63)
    return tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_quantity")), 6).alias("qty_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.col("l_extendedprice"), 1).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("qty_floor"),
        (F.col("l_linenumber") % 3).cast("long").alias("line_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


# Array functions over the embeddings vectors (ArrayType(Float) — the Spark
# mapping of the reference's np.ndarray payloads, bert/encoders/numpy.py:117).
# Element math is promoted to double on both sides before folding; the fold
# is sequential left-to-right in both engines (64 elements) → identical bits,
# rounded anyway for defense.
@query(
    "scalar_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           ROUND(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sum_sq,
           ROUND(sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_norm,
           CAST(list_aggregate(list_transform(embedding,
                 x -> CASE WHEN x > 0 THEN 1 ELSE 0 END), 'sum') AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    x2 = lambda x: x.cast("double") * x.cast("double")  # noqa: E731
    sum_sq = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x2(x)
    )
    return tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.round(sum_sq, 6).alias("sum_sq"),
        F.round(F.sqrt(sum_sq), 6).alias("l2_norm"),
        F.aggregate(
            F.col("embedding"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x > 0, 1).otherwise(0),
        ).alias("n_positive"),
    )


# JSON: the reference's free-form dict payloads (events.props mirrors
# QueueItem payloads). Parse on demand — schemaless stays cheap because only
# the requested path is extracted.
@query(
    "scalar_json",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        tbl(spark, sf_dir, "events")
        .groupBy((k % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_bucket,
           COUNT(*) AS n,
           COUNT(nullif(c_mktsegment, 'BUILDING')) AS n_non_building,
           COUNT(coalesce(nullif(c_mktsegment, 'BUILDING'), NULL)) AS n_coalesce
    FROM customer
    GROUP BY 1
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    non_building = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        tbl(spark, sf_dir, "customer")
        .groupBy(bucket.alias("bal_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.count(non_building).alias("n_non_building"),
            F.count(F.coalesce(non_building, F.lit(None))).alias("n_coalesce"),
        )
    )


# Content identity (SURVEY §2A#18): sha256/md5 over a canonical column
# concatenation — the deterministic variant of QueueItem.calc_identity.
@query(
    "scalar_hash",
    oracle="""
    SELECT c_custkey,
           sha256(concat_ws('|', c_name, c_mktsegment)) AS identity_sha,
           md5(c_name) AS name_md5
    FROM customer
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        F.sha2(F.concat_ws("|", "c_name", "c_mktsegment"), 256).alias("identity_sha"),
        F.md5(F.col("c_name")).alias("name_md5"),
    )


# VARIANT (Spark 4 semi-structured type): parse once, extract typed paths —
# the modern engine-native mapping of the reference's schemaless payloads
# (binary-encoded, pruned, no re-parse per extraction).
@query(
    "scalar_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS DOUBLE) / 2 AS half_k
    FROM events
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.parse_json(F.col("props"))
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        (F.variant_get(v, "$.k", "double") / 2).alias("half_k"),
    )


# Explicit null ordering — Spark default (NULLS FIRST asc / LAST desc)
# differs from other engines; always pin it at sort boundaries feeding
# limits (SURVEY §7 risk 2).
@query(
    "sort_nulls_last",
    oracle="""
    SELECT c.c_custkey, MAX(o.o_orderdate) AS last_order
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY last_order DESC NULLS LAST, c.c_custkey
    LIMIT 25
    """,
)
def sort_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.max("o_orderdate").alias("last_order"))
        .orderBy(F.col("last_order").desc_nulls_last(), "c_custkey")
        .limit(25)
    )


# Null-safe comparison semantics (<=> / IS [NOT] DISTINCT FROM): the corner
# where ordinary equality silently drops rows.
@query(
    "scalar_nullsafe",
    oracle="""
    WITH t AS (
        SELECT event_id,
               nullif(event_type, 'error') AS a,
               nullif(event_type, 'click') AS b
        FROM events
    )
    SELECT a IS NOT DISTINCT FROM b AS nullsafe_eq,
           a IS DISTINCT FROM b AS distinct_from,
           COUNT(*) AS n
    FROM t GROUP BY 1, 2
    """,
)
def scalar_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = F.nullif(F.col("event_type"), F.lit("error"))
    b = F.nullif(F.col("event_type"), F.lit("click"))
    return (
        tbl(spark, sf_dir, "events")
        .select(a.alias("a"), b.alias("b"))
        .groupBy(
            F.col("a").eqNullSafe(F.col("b")).alias("nullsafe_eq"),
            (~F.col("a").eqNullSafe(F.col("b"))).alias("distinct_from"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "scalar_array2",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
               WHERE doc_id < 50)
    SELECT doc_id,
           list_contains(toks, 'data') AS has_data,
           list_sort(list_distinct(toks))[1] AS first_token_sorted,
           len(list_filter(toks, t -> length(t) > 4)) AS n_long_tokens,
           list_transform(toks, t -> upper(t))[1] AS first_upper,
           array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), '|') AS first3,
           len(flatten([toks, toks])) AS doubled_len,
           len(range(0, len(toks), 2)) AS n_even_positions
    FROM t
    """,
)
def scalar_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    toked = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.split(F.trim(F.col("text")), " ").alias("toks"))
    )
    sorted_distinct = F.array_sort(F.array_distinct("toks"))
    return toked.select(
        "doc_id",
        F.array_contains("toks", "data").alias("has_data"),
        F.element_at(sorted_distinct, 1).alias("first_token_sorted"),
        F.size(F.filter("toks", lambda t: F.length(t) > 4)).cast("long").alias("n_long_tokens"),
        F.element_at(F.transform("toks", F.upper), 1).alias("first_upper"),
        F.array_join(F.slice(sorted_distinct, 1, 3), "|").alias("first3"),
        F.size(F.flatten(F.array("toks", "toks"))).cast("long").alias("doubled_len"),
        F.size(F.sequence(F.lit(0), F.size("toks") - 1, F.lit(2))).cast("long").alias(
            "n_even_positions"
        ),
    )


# Schema-first JSON parsing (from_json with an explicit schema — the
# production path for the reference's dict payloads; get_json_object in
# scalar_json is the exploratory path).
@query(
    "scalar_from_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS absent
    FROM events
    """,
)
def scalar_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = F.from_json(F.col("props"), "k BIGINT, missing BIGINT")
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        parsed.getField("missing").alias("absent"),
    )


@query(
    "scalar_string2",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           rpad(p_brand, 12, '.') AS brand_padded,
           translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
           repeat(p_brand, 2) AS brand2,
           reverse(p_name) AS name_rev,
           split_part(p_name, ' ', 2) AS second_word,
           left(p_type, 3) AS type3,
           right(p_type, 3) AS type_last3,
           contains(p_name, 'red') AS has_red,
           starts_with(p_type, 'SMALL') AS is_small,
           ascii(p_brand) AS first_code,
           chr(65 + p_size % 26) AS size_chr
    FROM part
    """,
)
def scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "part").select(
        "p_partkey",
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad(F.col("p_brand"), 12, ".").alias("brand_padded"),
        F.translate(F.col("p_name"), "aeiou", "AEIOU").alias("name_tr"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.substring(F.col("p_type"), 1, 3).alias("type3"),
        F.col("p_type").substr(F.length("p_type") - 2, F.lit(3)).alias("type_last3"),
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_type").startswith("SMALL").alias("is_small"),
        F.ascii(F.col("p_brand")).cast("int").alias("first_code"),
        F.chr(65 + F.col("p_size") % 26).alias("size_chr"),
    )


@query(
    "scalar_date2",
    oracle="""
    SELECT o_orderkey,
           CAST(make_date(year(o_orderdate), month(o_orderdate), 1) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym,
           quarter(o_orderdate) AS q
    FROM orders
    """,
)
def scalar_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1))
        .cast("timestamp")
        .alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.quarter("o_orderdate").cast("long").alias("q"),
    )


@query(
    "scalar_bitops",
    oracle="""
    SELECT event_id,
           user_id & 255 AS low_byte,
           user_id | 4096 AS with_flag,
           xor(user_id, event_id) AS mixed,
           user_id << 2 AS shifted,
           user_id >> 1 AS halved
    FROM events
    """,
)
def scalar_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("user_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("user_id").bitwiseXOR(F.col("event_id")).alias("mixed"),
        F.shiftleft(F.col("user_id"), 2).alias("shifted"),
        F.shiftright(F.col("user_id"), 1).alias("halved"),
    )


# Map functions: build a map, read it back (reference payloads are nested
# dicts → MapType). Oracle computes the equivalent value directly.
@query(
    "scalar_map",
    oracle="""
    SELECT event_id, event_type AS type_from_map, 2 AS n_keys
    FROM events
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


# String batch 3: initcap/left/right/replace + binary-ish encodings.
# All JVM-side expressions inside one whole-stage-codegen span; the
# projection prunes the scan to the two referenced columns.
@query(
    "scalar_string3",
    oracle="""
    SELECT p_partkey,
           array_to_string(
               list_transform(string_split(lower(p_name), ' '),
                              w -> upper(w[1]) || w[2:]),
               ' ') AS name_title,
           left(p_name, 5) AS name_l5,
           right(p_name, 3) AS name_r3,
           replace(p_type, 'a', '@') AS type_rep,
           p_name LIKE 'part%' AS is_part_prefix,
           contains(p_type, 'e') AS has_e
    FROM part
    """,
)
def scalar_string3(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tbl(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.initcap(F.lower("p_name")).alias("name_title"),
        F.expr("left(p_name, 5)").alias("name_l5"),
        F.expr("right(p_name, 3)").alias("name_r3"),
        F.expr("replace(p_type, 'a', '@')").alias("type_rep"),
        F.col("p_name").like("part%").alias("is_part_prefix"),
        F.col("p_type").contains("e").alias("has_e"),
    )


# Regex batch: extract-all (array result), match count, boolean match.
# Regexes stay simple POSIX-compatible so both engines' regex libraries
# (Java util.regex vs RE2) agree.
@query(
    "scalar_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract_all(text, '[A-Za-z]+ing') AS ing_words,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numbers,
           regexp_matches(text, 'the') AS has_the
    FROM documents
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+ing"), 0).alias("ing_words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)).alias("n_numbers"),
        F.col("text").rlike("the").alias("has_the"),
    )


# Date batch 3: month arithmetic (both engines clamp to end-of-month),
# day-of-year/ISO week, and time-of-day parts on the events stream.
@query(
    "scalar_date3",
    oracle="""
    SELECT event_id,
           CAST(ts + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(ts + INTERVAL 45 DAY AS TIMESTAMP) AS plus_45d,
           dayofyear(ts) AS doy,
           weekofyear(ts) AS iso_week,
           hour(ts) AS h,
           minute(ts) AS m
    FROM events
    """,
)
def scalar_date3(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("ts + make_interval(0, 3)").alias("plus_3m"),
        F.expr("ts + make_interval(0, 0, 0, 45)").alias("plus_45d"),
        # DuckDB date-part extracts are BIGINT; Spark's are int — cast up
        F.dayofyear("ts").cast("bigint").alias("doy"),
        F.weekofyear("ts").cast("bigint").alias("iso_week"),
        F.hour("ts").cast("bigint").alias("h"),
        F.minute("ts").cast("bigint").alias("m"),
    )


# Array batch 3: set algebra over arrays. Spark's array_union/intersect/
# except dedup; DuckDB oracles spell out the same semantics with
# list_distinct + list_filter. array_sort on both sides makes the value
# comparison order-free.
@query(
    "scalar_array3",
    oracle="""
    WITH t AS (
        SELECT p_partkey,
               range(1, (p_size % 5) + 4) AS a,
               range(2, 5) AS b
        FROM part
    )
    SELECT p_partkey,
           list_sort(list_distinct(list_concat(a, b))) AS u,
           list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))) AS i,
           list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))) AS d,
           CAST(coalesce(list_position(a, 3), 0) AS BIGINT) AS pos3,
           list_max(a) AS amax
    FROM t
    """,
)
def scalar_array3(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tbl(spark, sf_dir, "part")
    t = part.select(
        "p_partkey",
        # bigint bounds → array<bigint>, matching DuckDB range() = BIGINT[]
        F.sequence(
            F.lit(1).cast("bigint"), ((F.col("p_size") % 5) + 3).cast("bigint")
        ).alias("a"),
        F.sequence(F.lit(2).cast("bigint"), F.lit(4).cast("bigint")).alias("b"),
    )
    return t.select(
        "p_partkey",
        F.array_sort(F.array_union("a", "b")).alias("u"),
        F.array_sort(F.array_intersect("a", "b")).alias("i"),
        F.array_sort(F.array_except("a", "b")).alias("d"),
        F.array_position("a", 3).cast("bigint").alias("pos3"),
        F.array_max("a").alias("amax"),
    )


# Map functions batch 2: transform_values, map_filter, map_concat,
# map_zip_with — Spark's full MapType op surface. Outputs are scalars
# (element_at / cardinality) because map VALUES don't hash portably
# across engines; the oracle computes the same scalars directly.
@query(
    "scalar_map2",
    oracle="""
    SELECT event_id,
           value * 2.0 AS doubled_value,
           CASE WHEN value > 10.0 THEN 2 ELSE 1 END AS n_kept,
           CAST(user_id AS DOUBLE) + value AS zipped
    FROM events
    """,
)
def scalar_map2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    base = F.create_map(
        F.lit("v"), F.col("value"), F.lit("uid"), F.col("user_id").cast("double")
    )
    doubled = F.transform_values(base, lambda k, v: v * 2.0)
    kept = F.map_filter(base, lambda k, v: (k == F.lit("uid")) | (v > 10.0))
    zipped = F.map_zip_with(
        F.create_map(F.lit("x"), F.col("user_id").cast("double")),
        F.create_map(F.lit("x"), F.col("value")),
        lambda k, a, b: a + b,
    )
    return ev.select(
        "event_id",
        F.element_at(doubled, "v").alias("doubled_value"),
        F.size(F.map_keys(kept)).cast("int").alias("n_kept"),
        F.element_at(zipped, "x").alias("zipped"),
    )


# try_ functions: null-on-error arithmetic/casts (the reference's
# permissive Python semantics — a failed item doesn't kill the job).
@query(
    "scalar_try",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity / nullif(l_linenumber - 1, 0) AS per_prior_line,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip
    FROM lineitem
    """,
)
def scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_quantity", F.col("l_linenumber") - 1).alias("per_prior_line"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_quantity").cast("string").try_cast("double").alias("qty_roundtrip"),
    )


# Binary encodings: hex, base64 round-trip, population count.
@query(
    "scalar_encoding",
    oracle="""
    SELECT event_id,
           hex(user_id) AS uid_hex,
           to_base64(encode(event_type)) AS type_b64,
           octet_length(from_base64(to_base64(encode(event_type)))) AS n_bytes,
           CAST(bit_count(user_id) AS INTEGER) AS uid_bits
    FROM events
    """,
)
def scalar_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    b64 = F.base64(F.col("event_type").cast("binary"))
    return ev.select(
        "event_id",
        F.hex("user_id").alias("uid_hex"),
        b64.alias("type_b64"),
        F.length(F.unbase64(b64)).cast("bigint").alias("n_bytes"),
        F.bit_count("user_id").cast("int").alias("uid_bits"),
    )


# Nested struct round-trip: build a nested struct (the reference's
# nested-dict payload, 'M'-map wire shape — bert/encoders/base.py:25-26
# in /root/reference), access a deep field, serialize to canonical JSON.
# Struct columns stay in Tungsten rows end-to-end; only the JSON string
# and extracted scalars are emitted (struct VALUES don't hash portably).
@query(
    "scalar_struct_nested",
    oracle="""
    SELECT event_id,
           to_json({'type': event_type,
                    'meta': {'uid': user_id, 'val': value}}) AS payload_json,
           {'type': event_type, 'meta': {'uid': user_id, 'val': value}}.meta.uid
               AS deep_uid
    FROM events
    """,
)
def scalar_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    payload = F.struct(
        F.col("event_type").alias("type"),
        F.struct(
            F.col("user_id").alias("uid"), F.col("value").alias("val")
        ).alias("meta"),
    )
    return ev.select(
        "event_id",
        F.to_json(payload).alias("payload_json"),
        payload.getField("meta").getField("uid").alias("deep_uid"),
    )


# String batch 4: padding, character translation, repetition/reversal,
# delimiter splitting, edit distance. All per-row JVM expressions — no
# shuffle at any scale; levenshtein is the one worth watching (O(len²)
# per row) but stays codegen'd.
@query(
    "scalar_string4",
    oracle="""
    SELECT p_partkey,
           lpad(p_name, 30, '*') AS name_lpad,
           rpad(p_name, 30, '.') AS name_rpad,
           translate(p_type, 'aeiou', '12345') AS type_translated,
           repeat('-', p_size % 5) AS dashes,
           reverse(p_name) AS name_rev,
           split_part(p_type, ' ', 2) AS type_word2,
           CAST(levenshtein(left(p_name, 8), left(p_type, 8)) AS INTEGER)
               AS name_type_dist
    FROM part
    """,
)
def scalar_string4(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tbl(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lpad("p_name", 30, "*").alias("name_lpad"),
        F.rpad("p_name", 30, ".").alias("name_rpad"),
        F.translate("p_type", "aeiou", "12345").alias("type_translated"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5)).alias("dashes"),
        F.reverse("p_name").alias("name_rev"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_word2"),
        F.levenshtein(F.expr("left(p_name, 8)"), F.expr("left(p_type, 8)")).alias(
            "name_type_dist"
        ),
    )


# Date batch 4: date construction (make_date round-trip through parts),
# end-of-month, quarter, ISO-week truncation, day arithmetic vs an epoch.
# DuckDB traps handled: date_trunc returns DATE (cast to TIMESTAMP),
# quarter/date_diff return BIGINT (cast to INTEGER to match Spark).
@query(
    "scalar_date4",
    oracle="""
    SELECT o_orderkey,
           make_date(CAST(year(o_orderdate) AS INTEGER),
                     CAST(month(o_orderdate) AS INTEGER),
                     CAST(day(o_orderdate) AS INTEGER)) AS rebuilt,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
           CAST(date_diff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE))
                AS INTEGER) AS days_since_epoch_96
    FROM orders
    """,
)
def scalar_date4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.make_date(F.year(d), F.month(d), F.dayofmonth(d)).alias("rebuilt"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("q"),
        F.date_trunc("week", d).alias("week_start"),
        F.datediff(d.cast("date"), F.lit("1996-01-01").cast("date")).alias(
            "days_since_epoch_96"
        ),
    )


# URL parsing batch: Spark's parse_url (HOST/PATH/QUERY-param extraction,
# java.net.URI-backed) vs an equivalent regex decomposition in DuckDB (which
# has no URL functions). The URL is assembled from table columns so the
# corpus is well-formed by construction — the regexes and parse_url agree on
# well-formed http(s) URLs. Pure per-row projection: codegen, zero shuffle.
@query(
    "scalar_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/'
                   || CAST(doc_id AS VARCHAR) || '?lang=' || lang
                   || '&sz=' || CAST(n_chars AS VARCHAR) AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, 'https://([^/?#]+)', 1) AS host,
           regexp_extract(url, 'https://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang,
           regexp_extract(url, '[?&]sz=([^&#]*)', 1) AS q_sz,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
)
def scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&sz="),
        F.col("n_chars").cast("string"),
    )
    return tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.parse_url(url, F.lit("QUERY"), F.lit("sz")).alias("q_sz"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


# String batch 5: positional/codepoint functions + C-style formatting —
# instr/strpos, ascii, chr, and printf-style templating (Spark
# format_string ≡ DuckDB printf for %s/%d). Pure projection, codegen,
# zero shuffle.
@query(
    "scalar_string5",
    oracle="""
    SELECT c_custkey,
           CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
           CAST(ascii(substr(c_mktsegment, 1, 1)) AS INTEGER) AS seg_first_code,
           chr(65 + CAST(c_custkey % 26 AS INTEGER)) AS bucket_letter,
           printf('%s/%d/%s', c_mktsegment, c_nationkey, c_name) AS tag
    FROM customer
    """,
)
def scalar_string5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.instr("c_name", "#").alias("hash_pos"),
        F.ascii(F.substring("c_mktsegment", 1, 1)).alias("seg_first_code"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias(
            "bucket_letter"
        ),
        F.format_string("%s/%d/%s", "c_mktsegment", "c_nationkey", "c_name").alias(
            "tag"
        ),
    )


# Math batch 2: trigonometric/inverse functions (DuckDB has no sinh/cosh
# — inverse functions take sin/cos outputs so their domain is valid). All
# transcendental (libm last-bit differs across engines), so every output
# rounds to 6 dp — the documented determinism recipe. atan2 keeps the
# two-argument quadrant semantics identical in both engines.
@query(
    "scalar_math2",
    oracle="""
    SELECT event_id,
           ROUND(sin(value), 6) AS sin_v,
           ROUND(cos(value), 6) AS cos_v,
           ROUND(tan(value / CAST(10.0 AS DOUBLE)), 6) AS tan_v,
           ROUND(atan2(value, CAST(user_id + 1 AS DOUBLE)), 6) AS atan2_v,
           ROUND(asin(sin(value)), 6) AS asin_v,
           ROUND(acos(cos(value)), 6) AS acos_v,
           ROUND(cbrt(value), 6) AS cbrt_v,
           ROUND(degrees(value), 6) AS deg_v,
           ROUND(radians(value), 6) AS rad_v
    FROM events
    """,
)
def scalar_math2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.sin(v), 6).alias("sin_v"),
        F.round(F.cos(v), 6).alias("cos_v"),
        F.round(F.tan(v / 10.0), 6).alias("tan_v"),
        F.round(F.atan2(v, (F.col("user_id") + 1).cast("double")), 6).alias(
            "atan2_v"
        ),
        F.round(F.asin(F.sin(v)), 6).alias("asin_v"),
        F.round(F.acos(F.cos(v)), 6).alias("acos_v"),
        F.round(F.cbrt(v), 6).alias("cbrt_v"),
        F.round(F.degrees(v), 6).alias("deg_v"),
        F.round(F.radians(v), 6).alias("rad_v"),
    )


# Array batch 4: position lookup, dedup/remove/compact cardinalities,
# flatten, concat — compared by size where the engines don't guarantee
# identical element order (list_distinct). The probe array is the doc's
# first 12 tokens; every expression is a pure projection.
@query(
    "scalar_array4",
    oracle="""
    WITH a AS (
        SELECT doc_id, string_split(trim(text), ' ')[1:12] AS t
        FROM documents
        WHERE len(string_split(trim(text), ' ')) >= 12
    )
    SELECT doc_id,
           CAST(list_position(t, t[3]) AS INTEGER) AS pos_third,
           CAST(len(list_distinct(t)) AS INTEGER) AS n_distinct,
           CAST(len(list_filter(t, x -> x != t[1])) AS INTEGER) AS n_removed,
           CAST(len(flatten([t[1:3], t[4:6]])) AS INTEGER) AS n_flat,
           CAST(len(list_concat(t, t)) AS INTEGER) AS n_doubled,
           CAST(len(list_filter(list_transform(t, x -> nullif(x, t[2])),
                                x -> x IS NOT NULL)) AS INTEGER) AS n_compact
    FROM a
    """,
)
def scalar_array4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.operators.dedup import tokenize

    docs = tbl(spark, sf_dir, "documents")
    a = docs.select(
        "doc_id", F.slice(tokenize(F.col("text")), 1, 12).alias("t")
    ).filter(F.size(tokenize(F.col("text"))) >= 12)
    first = F.element_at("t", 1)
    second = F.element_at("t", 2)
    third = F.element_at("t", 3)
    return a.select(
        "doc_id",
        F.array_position("t", third).cast("int").alias("pos_third"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        F.size(F.array_remove("t", first)).alias("n_removed"),
        F.size(
            F.flatten(F.array(F.slice("t", 1, 3), F.slice("t", 4, 3)))
        ).alias("n_flat"),
        F.size(F.concat(F.col("t"), F.col("t"))).alias("n_doubled"),
        F.size(
            F.array_compact(F.transform("t", lambda x: F.nullif(x, second)))
        ).alias("n_compact"),
    )
