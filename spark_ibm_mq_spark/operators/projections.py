"""Projections, filters, conditionals, and scalar-function families
(SURVEY.md §2.2 "Projections / filters / predicates" + "Scalar functions").

The reference's only projection is the envelope build (IBMMQReceiver.java:256-264)
and its consumers' JSON field extraction (README.md:10-17); everything here is the
DataFrame surface those consumers use.

Scale notes: all queries are narrow scans — projection lists and filter
predicates must reach the parquet scan (ReadSchema / PushedFilters). Every
expression is a built-in pyspark.sql.functions column op, so the whole stage
stays in WholeStageCodegen; no Python executes per-row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table

# DuckDB views read events.ts as TIMESTAMP_NS; cast to µs to match the Spark
# loader's ns→µs conversion (tables.load_table).
EVENTS_CTE = (
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM events)"
)


@register(
    "proj_compute",
    oracle="""
    SELECT
        p_partkey,
        upper(p_name)                         AS name_upper,
        concat_ws('/', p_brand, p_type)       AS brand_type,
        round(p_retailprice * 1.1, 4)         AS price_taxed,
        length(p_name)                        AS name_len
    FROM part
    """,
)
def proj_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection / aliasing / computed columns (§2.2; reference R4
    envelope build is the analogous projection, IBMMQReceiver.java:256-264)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 4).alias("price_taxed"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 4) AS qty
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 40
      AND l_linestatus LIKE 'F%'
      AND l_shipdate IS NOT NULL
      AND NOT (l_discount < 0.01)
    GROUP BY l_returnflag, l_linestatus
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction/IN/BETWEEN/LIKE/null-test/negation filters — all pushable
    predicates (PushedFilters in explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_returnflag").isin("A", "R")
            & F.col("l_quantity").between(10, 40)
            & F.col("l_linestatus").like("F%")
            & F.col("l_shipdate").isNotNull()
            & ~(F.col("l_discount") < 0.01)
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("qty"),
        )
    )


@register(
    "conditional_case",
    oracle="""
    SELECT
        CASE WHEN o_totalprice > 200000 THEN 'high'
             WHEN o_totalprice > 100000 THEN 'mid'
             ELSE 'low' END                                   AS price_class,
        coalesce(nullif(o_orderstatus, 'O'), 'OPEN')          AS status_mapped,
        count(*)                                              AS n,
        round(avg(o_totalprice), 4)                           AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif (§2.2 conditional expressions)."""
    o = load_table(spark, sf_dir, "orders")
    price_class = (
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
    )
    status_mapped = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN"))
    return (
        o.groupBy(price_class.alias("price_class"), status_mapped.alias("status_mapped"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )


@register(
    "string_funcs",
    oracle="""
    SELECT
        c_custkey,
        substring(c_name, 1, 8)                      AS name_head,
        lpad(CAST(c_custkey AS VARCHAR), 6, '0')     AS key_padded,
        translate(c_mktsegment, 'AEIOU', 'aeiou')    AS seg_vowels,
        regexp_extract(c_name, '([0-9]+)', 1)        AS name_digits,
        strpos(c_name, '#')                          AS hash_pos,
        levenshtein(c_mktsegment, 'BUILDING')        AS lev_building,
        lower(trim(c_mktsegment))                    AS seg_lower
    FROM customer
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: substring/lpad/translate/regexp_extract/instr/
    levenshtein/lower/trim (§2.2 scalar functions; reference decodes+concats
    strings at IBMMQReceiver.java:255,259)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring("c_name", 1, 8).alias("name_head"),
        F.lpad(F.col("c_custkey").cast("string"), 6, "0").alias("key_padded"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_vowels"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
        F.lower(F.trim("c_mktsegment")).alias("seg_lower"),
    )


@register(
    "datetime_funcs",
    oracle="""
    SELECT
        o_orderkey,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)     AS order_month,
        CAST(year(o_orderdate) AS INT)                          AS order_year,
        CAST(month(o_orderdate) AS INT)                         AS order_moy,
        CAST(dayofmonth(o_orderdate) AS INT)                    AS order_dom,
        datediff('day', o_orderdate, TIMESTAMP '1998-01-01')    AS days_to_98,
        CAST(o_orderdate + INTERVAL 30 DAY AS DATE)             AS due_date,
        epoch_ms(o_orderdate)                                   AS order_ms
    FROM orders
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: trunc/extract/diff/add/epoch-millis (§2.2; the
    reference's key is putDateTime→millis, IBMMQReceiver.java:250)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_moy"),
        F.dayofmonth("o_orderdate").alias("order_dom"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_98"),
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("order_ms"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT
        l_orderkey, l_linenumber,
        round(l_extendedprice, 2)                       AS price_r2,
        CAST(floor(l_extendedprice) AS BIGINT)          AS price_floor,
        CAST(ceil(l_extendedprice) AS BIGINT)           AS price_ceil,
        abs(l_discount - 0.05)                          AS disc_dev,
        round(power(l_quantity, 2), 4)                  AS qty_sq,
        round(sqrt(l_extendedprice), 4)                 AS price_sqrt,
        round(ln(l_extendedprice), 4)                   AS price_ln,
        l_orderkey % 7                                  AS key_mod7,
        greatest(l_tax, l_discount)                     AS rate_max,
        least(l_tax, l_discount)                        AS rate_min
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/floor/ceil/abs/pow/sqrt/ln/pmod/greatest/least."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.greatest("l_tax", "l_discount").alias("rate_max"),
        F.least("l_tax", "l_discount").alias("rate_min"),
    )


@register(
    "json_funcs",
    oracle=f"""
    {EVENTS_CTE}
    SELECT
        event_id,
        json_extract_string(props, '$.k')            AS k_str,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
             THEN 'hi' ELSE 'lo' END                 AS k_band
    FROM ev
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object + from_json typed extraction — the
    consumer-side parse contract (README.md:12-15)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.when(parsed.getField("k") >= 50, "hi").otherwise("lo").alias("k_band"),
    )


@register(
    "array_funcs",
    oracle="""
    SELECT
        vec_id,
        len(embedding)                               AS dim,
        round(CAST(embedding[1] AS DOUBLE), 4)       AS head_val,
        array_to_string(
            list_transform(
                list_sort(list_transform(embedding[1:4],
                          x -> round(CAST(x AS DOUBLE), 4))),
                x -> printf('%.4f', x)), ',')        AS head4_sorted,
        round(CAST(embedding[1] AS DOUBLE)
              + CAST(embedding[2] AS DOUBLE), 4)     AS head2_sum
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size/element_at/slice/transform/array_sort over the
    embedding ARRAY<FLOAT> column (§2.2 Array; north-star vector ops).

    The sorted head-slice is emitted as a ``%.4f``-joined string so the
    driver's pandas canonicalizer can hash the cell (round-1 FAIL: ndarray
    cells are unhashable); the array ops stay in the plan."""
    e = load_table(spark, sf_dir, "embeddings")
    head4 = F.transform(
        F.slice("embedding", 1, 4), lambda x: F.round(x.cast("double"), 4)
    )
    head4_str = F.transform(
        F.array_sort(head4), lambda x: F.format_string("%.4f", x)
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("head_val"),
        F.array_join(head4_str, ",").alias("head4_sorted"),
        F.round(
            F.element_at("embedding", 1).cast("double")
            + F.element_at("embedding", 2).cast("double"),
            4,
        ).alias("head2_sum"),
    )


@register(
    "map_funcs",
    oracle=f"""
    {EVENTS_CTE}
    SELECT
        event_id,
        array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
        CAST(json_extract_string(props, '$.k') AS INT)    AS k_val
    FROM ev
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: from_json→MapType, map_keys, element_at (§2.2 Map; props
    payload mirrors the reference's stringly-typed body).

    Keys are emitted sorted-and-joined (scalar string) so the driver's
    canonicalizer can hash the cell; the MapType ops stay in the plan."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


@register(
    "hash_funcs",
    oracle="""
    SELECT
        doc_id,
        md5(text)                AS text_md5,
        sha256(text)             AS text_sha256,
        length(text)             AS text_len
    FROM documents
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 / sha2-256 (§2.2 Hash/misc — the dedup primitives)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length("text").alias("text_len"),
    )
