"""Projection / filter / scalar-function surface (SURVEY §2.3).

Every function here is a Spark built-in (JVM-side, whole-stage codegen);
no Python UDFs appear on these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Tables, query

#: Definitely-invalid pre-guard for string->int try_cast (r12): admits a
#: SUPERSET of every string Spark's UTF8String.toInt grammar could accept
#: (any amount of <= 0x20 lead trim, optional sign, then a digit), so
#: guarded try_cast is value-identical to the bare one while the per-row
#: JVM throw/catch never fires on definitely-non-numeric rows. The guard
#: COUPLES to Spark's cast grammar (VERDICT r12 item 4): a version bump
#: that widened the grammar (e.g. accepting unicode digits) would
#: silently diverge — tests/test_try_cast_guard.py re-derives equivalence
#: against the live engine on an adversarial + seeded-random corpus every
#: run, so the pin fails loudly instead.
TRY_INT_GUARD_RX = "^[\\x00- ]*[+-]?[0-9]"


@query(
    "scalar_select_rename",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS customer_name, c_mktsegment AS segment
    FROM customer
    """,
)
def scalar_select_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + rename (O10's select/toDF shape). Catalyst prunes
    the parquet scan down to the three referenced columns."""
    t = Tables(spark, sf_dir)
    return t.customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "scalar_filter_rlike",
    oracle=r"""
    SELECT event_id, event_type
    FROM events
    WHERE regexp_matches(event_type, '^(purchase|signup)$')
    """,
)
def scalar_filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-validity filter — the O13 guard-regex pattern as a WHERE."""
    t = Tables(spark, sf_dir)
    return t.events.filter(
        F.col("event_type").rlike(r"^(purchase|signup)$")
    ).select("event_id", "event_type")


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           lower(c_name)            AS name_lower,
           upper(c_mktsegment)      AS seg_upper,
           trim(c_name)             AS name_trim,
           length(c_name)           AS name_len,
           substr(c_name, 1, 8)     AS name_prefix,
           replace(c_name, '#', '') AS name_nohash
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/trim/length/substring/replace (string.rb surface)."""
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim("c_name").alias("name_trim"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("")).alias("name_nohash"),
    )


@query(
    "scalar_translate",
    oracle="""
    SELECT p_partkey, translate(p_type, 'AEIOU', 'aeiou') AS type_folded
    FROM part
    """,
)
def scalar_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-map translate — the Spark primitive behind the O22
    diacritic fold (naming.py holds the driver-side full table)."""
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey", F.translate("p_type", "AEIOU", "aeiou").alias("type_folded")
    )


@query(
    "scalar_regexp_replace",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(text, '<[^>]+>', '', 'g')         AS text_notags,
           regexp_replace(text, '[0-9]+', '#', 'g')         AS text_nonum
    FROM documents
    """,
)
def scalar_regexp_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_replace chains (O23 strip-tags semantics)."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.regexp_replace("text", r"<[^>]+>", "").alias("text_notags"),
        F.regexp_replace("text", r"[0-9]+", "#").alias("text_nonum"),
    )


@query(
    "scalar_when_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'pending' END AS status_label,
           CASE WHEN o_totalprice > 200000 THEN 'large' ELSE 'small' END AS size_label
    FROM orders
    """,
)
def scalar_when_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise conditionals (O13 guard semantics)."""
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_label"),
        F.when(F.col("o_totalprice") > 200000, "large")
        .otherwise("small")
        .alias("size_label"),
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT event_id,
           year(ts)                   AS y,
           month(ts)                  AS m,
           day(ts)                    AS d,
           hour(ts)                   AS h,
           date_trunc('day', ts)      AS day_start,
           date_trunc('hour', ts)     AS hour_start,
           strftime(ts, '%Y-%m-%d')   AS day_str
    FROM events
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extraction/truncation (DBF date + created_at semantics)."""
    t = Tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(abs(l_discount - 0.05) * 10000 + 0.5) AS BIGINT) AS disc_dev_e4,
           CAST(floor(l_quantity) AS BIGINT)      AS qty_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(floor(sqrt(l_quantity) * 10000 + 0.5) AS BIGINT)       AS qty_sqrt_e4,
           CAST(l_quantity AS INTEGER) % 7        AS qty_mod
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/round/floor/ceil/sqrt/mod math surface.

    Rounding to 4 dp is expressed as scaled BIGINTs (``floor(x*1e4+0.5)``,
    no trailing ``/1e4``) on BOTH engines. The r01 floats diverged in the
    last digit (Spark round() = BigDecimal HALF_UP on the exact binary
    expansion vs DuckDB rounding the scaled double); the r02 shared-IEEE
    ``floor(x*1e4+0.5)/1e4`` form was bitwise identical locally yet STILL
    hash-mismatched under the driver, so r03 removes the float pathway
    entirely: integer columns are immune to any float canonicalization
    the driver's value-hash may apply.

    floor/ceil results are CAST to BIGINT on the DuckDB side because its
    floor(DOUBLE) returns DOUBLE while Spark's returns LONG."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.abs(F.col("l_discount") - 0.05) * 10000 + 0.5)
        .alias("disc_dev_e4"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.floor(F.sqrt("l_quantity") * 10000 + 0.5).alias("qty_sqrt_e4"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod"),
    )


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')        AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
    FROM events
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (O11's GeoJSON-in-a-cell
    shape; events.props here)."""
    t = Tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k")
    return t.events.select(
        "event_id", k.alias("k_str"), k.cast("int").alias("k_int")
    )


@query(
    "scalar_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_field
    FROM events
    """,
)
def scalar_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct + getField access."""
    t = Tables(spark, sf_dir)
    parsed = F.from_json(F.col("props"), "k INT")
    return t.events.select(
        "event_id", parsed.getField("k").alias("k_field")
    )


@query(
    "scalar_array_ops",
    oracle="""
    SELECT vec_id,
           len(embedding)                                AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4)        AS first_component,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS component_sum
    FROM embeddings
    """,
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size / element access / fold — `F.aggregate` keeps the fold
    JVM-side (no UDF) which is what makes it viable on 100 TB of vectors."""
    t = Tables(spark, sf_dir)
    vec = F.col("embedding").cast("array<double>")
    return t.embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(vec, 1), 4).alias("first_component"),
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("component_sum"),
    )


@query(
    "scalar_cast_lattice",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER)  AS k_int,
           CAST(json_extract_string(props, '$.k') AS DOUBLE)   AS k_float,
           CAST(value AS VARCHAR)                              AS value_str
    FROM events
    """,
)
def scalar_cast_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.2 promotion lattice as casts: integer -> float -> varchar."""
    t = Tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k")
    return t.events.select(
        "event_id",
        k.cast("int").alias("k_int"),
        k.cast("double").alias("k_float"),
        F.col("value").cast("string").alias("value_str"),
    )


@query(
    "scalar_map_ops",
    oracle="""
    SELECT event_id,
           array_to_string(['k','type'], ',')                    AS keys_csv,
           CAST(json_extract_string(props, '$.k') AS INTEGER)    AS k_value,
           event_type                                            AS type_value
    FROM events
    """,
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key/value access (create_map, map_keys,
    element_at) — output flattened to scalars so the check is
    engine-portable."""
    t = Tables(spark, sf_dir)
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k"),
        F.lit("type"), F.col("event_type"),
    )
    return t.events.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "k").cast("int").alias("k_value"),
        F.element_at(m, "type").alias("type_value"),
    )


@query(
    "scalar_fuzzy_match",
    oracle="""
    SELECT s.s_suppkey,
           min(levenshtein(s.s_name, n.n_name)) AS min_edit_dist,
           arg_min(n.n_name, levenshtein(s.s_name, n.n_name) * 100 + n.n_nationkey)
             AS closest_name
    FROM supplier s CROSS JOIN nation n
    GROUP BY 1
    """,
)
def scalar_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: per supplier, the edit-distance-closest
    nation name (blocked cross join against a small candidate set + argmin
    — the name-resolution shape; tiebreak on nationkey keeps the argmin
    deterministic)."""
    t = Tables(spark, sf_dir)
    dist = F.levenshtein(F.col("s_name"), F.col("n_name"))
    return (
        t.supplier.crossJoin(F.broadcast(t.nation))
        .groupBy("s_suppkey")
        .agg(
            F.min(dist).alias("min_edit_dist"),
            F.min_by(
                F.col("n_name"), dist * 100 + F.col("n_nationkey")
            ).alias("closest_name"),
        )
    )


@query(
    "scalar_binary_encoding",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24)))  AS b64,
           lower(hex(encode(substr(text, 1, 8)))) AS hex_prefix,
           ascii(substr(text, 1, 1))              AS first_cp,
           chr(65 + CAST(doc_id % 26 AS INTEGER)) AS letter
    FROM documents
    """,
)
def scalar_binary_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64 / hex / ascii / chr — binary-column encode/decode surface
    (multimodal payloads travel through exactly these)."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.base64(F.encode(F.substring("text", 1, 24), "UTF-8")).alias("b64"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias(
            "hex_prefix"
        ),
        F.ascii(F.substring("text", 1, 1)).alias("first_cp"),
        F.chr(F.lit(65) + (F.col("doc_id") % 26).cast("int")).alias("letter"),
    )


@query(
    "scalar_variant_extract",
    oracle="""
    WITH j AS (
      SELECT o_orderkey,
             o_orderkey % 97 = 0 AS malformed,
             -- NULL (not a CASE around the extract: DuckDB evaluates both
             -- CASE branches vectorized, so the extract must never see the
             -- broken text) when the payload is the planted malformed row
             CASE WHEN o_orderkey % 97 = 0 THEN NULL
                  ELSE to_json(struct_pack(k := o_orderkey,
                                           price := o_totalprice,
                                           pri := o_orderpriority)) END AS js
      FROM orders
    )
    SELECT o_orderkey, malformed,
           json_extract(js, '$.k')::BIGINT AS k,
           round(json_extract(js, '$.price')::DOUBLE, 2) AS price,
           json_extract_string(js, '$.pri') AS pri
    FROM j
    """,
)
def scalar_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured columns: try_parse_json
    keeps malformed payloads as NULL instead of failing the job (1-in-97
    rows here are deliberately broken), variant_get extracts typed fields
    from the binary variant encoding — no schema declared up front, unlike
    from_json. At 100 TB this is the difference between re-parsing JSON
    text per predicate and one decode into a shredded binary the optimizer
    can push into."""
    t = Tables(spark, sf_dir)
    js = t.orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("{broken"))
        .otherwise(
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("k"),
                    F.col("o_totalprice").alias("price"),
                    F.col("o_orderpriority").alias("pri"),
                )
            )
        )
        .alias("js"),
    )
    v = js.select("o_orderkey", F.try_parse_json("js").alias("v"))
    return v.select(
        "o_orderkey",
        F.col("v").isNull().alias("malformed"),
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.round(F.variant_get("v", "$.price", "double"), 2).alias("price"),
        F.variant_get("v", "$.pri", "string").alias("pri"),
    )


@query(
    "scalar_sequence_explode",
    oracle="""
    SELECT r_regionkey,
           unnest(range(0, r_regionkey + 1)) AS i
    FROM region
    """,
)
def scalar_sequence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generation: sequence() + explode (SQL unnest(range(...))) — the
    scale-safe way to densify (each row expands locally on its executor; no
    driver-side loop, no cross-partition traffic)."""
    t = Tables(spark, sf_dir)
    return t.region.select(
        "r_regionkey",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("r_regionkey"))).alias(
            "i"
        ),
    )


@query(
    "scalar_url_parse",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || lower(source) || '.example.com/docs/'
                   || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, 'https?://([^/]+)', 1)       AS host,
           regexp_extract(url, 'https?://[^/]+([^?]*)', 1)  AS path,
           regexp_extract(url, '\\?(.*)$', 1)               AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)       AS lang_param
    FROM u
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the built-in parse_url (JVM-side; the oracle
    spells the same semantics as regexes). Crawl-scale pipelines use this
    for host-level grouping/blocking before dedup."""
    t = Tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.lower("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    u = t.documents.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "scalar_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / nullif(l_discount, 0.0)        AS price_per_disc,
           try_cast(l_returnflag AS INTEGER)                AS flag_int,
           try_cast(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS line_round_trip,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(l_extendedprice / l_quantity AS DOUBLE) END
             AS unit_price
    FROM lineitem
    """,
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface: try_divide / try_cast return NULL
    instead of raising — the error-tolerant lattice used on dirty data
    (the reference's type-inference fallback behavior, O-§2.2, expressed
    per-expression). DuckDB mirrors try_divide as x/nullif(y, 0).

    flag_int's try_cast carries a definitely-invalid pre-guard: Spark's
    string->int TRY cast reaches NULL by throwing and catching a JVM
    exception PER ROW, so a column that is mostly/always non-numeric
    (here: 'A'/'N'/'R') pays exception+stack-fill on every row — 8.8 s
    for this one expression at sf0.1 vs 0.23 s for the scan. The rlike
    admits exactly the strings Spark's grammar could accept (any amount
    of <= 0x20 lead trim, optional sign, then a digit — everything else
    is NULL under try_cast by construction, torture-set-verified incl.
    control-char trims and overflow bounds), so the guarded form is
    value-identical and the exception path only runs on plausibly
    numeric rows."""
    t = Tables(spark, sf_dir)
    flag = F.col("l_returnflag")
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_disc"
        ),
        F.when(flag.rlike(TRY_INT_GUARD_RX), flag.try_cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("flag_int"),
        F.col("l_linenumber").cast("string").try_cast("int").alias(
            "line_round_trip"
        ),
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "unit_price"
        ),
    )


@query(
    "scalar_null_semantics",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio2,
           nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL     AS is_open,
           CASE WHEN nullif(o_orderstatus, 'F') IS NULL THEN 'finished'
                WHEN o_totalprice > 200000 THEN 'big-live' ELSE 'small-live'
           END AS status_class,
           ifnull(try_cast(NULL AS INTEGER), -1)                    AS fallback
    FROM orders
    """,
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling battery: nullif/coalesce/ifnull, the null-safe
    equality operator (<=> / IS NOT DISTINCT FROM), and CASE null
    branches — three-valued-logic corners every engine must agree on."""
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
            F.lit("URGENT!"),
        ).alias("prio2"),
        F.nullif(F.col("o_orderstatus"), F.lit("O"))
        .eqNullSafe(F.lit(None).cast("string"))
        .alias("is_open"),
        F.when(
            F.nullif(F.col("o_orderstatus"), F.lit("F")).isNull(), "finished"
        )
        .when(F.col("o_totalprice") > 200000, "big-live")
        .otherwise("small-live")
        .alias("status_class"),
        F.ifnull(F.lit(None).cast("int"), F.lit(-1)).alias("fallback"),
    )
