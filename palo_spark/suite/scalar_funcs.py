"""Scalar function stdlib coverage (SURVEY.md §2.5) — one oracle-checked
query per family, exercising ``palo_spark.functions`` (the Doris-name
stdlib) against DuckDB dialect equivalents.

Every expression here compiles to native JVM Catalyst expressions (the
stdlib contains zero Python UDFs), so these stay in whole-stage codegen
at any scale; the queries are pure per-row projections — no shuffle at
all except where a small ORDER BY keeps output deterministic (the
parity harness sorts rows anyway; no ORDER BY needed).

Float determinism: math outputs are floor-quantized (``FLOOR(x*1e6)/1e6``
— same IEEE ops both engines) instead of ``round`` because Spark rounds
HALF_UP while DuckDB rounds half-even.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from palo_spark import functions as PF
from palo_spark.catalog import load_table
from palo_spark.suite.util import register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)


@q(
    "scalar_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<none>') AS seg_or_none,
           CASE WHEN c_name IS NOT NULL THEN 'named' ELSE 'anon' END AS nvl2_name,
           COALESCE(NULL, NULL, c_mktsegment) AS first_non_null
    FROM customer
    """,
)
def scalar_conditional(spark, sf_dir):
    """IF / IFNULL / NULLIF / NVL2 / COALESCE (Doris conditional family)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        PF.if_(F.col("c_acctbal") < 0, "neg", "pos").alias("bal_sign"),
        PF.ifnull(PF.nullif("c_mktsegment", "BUILDING"), "<none>").alias("seg_or_none"),
        PF.nvl2("c_name", "named", "anon").alias("nvl2_name"),
        PF.coalesce(F.lit(None), F.lit(None), F.col("c_mktsegment")).alias(
            "first_non_null"
        ),
    )


@q(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           left(p_name, 8)                         AS name8,
           right(p_name, 5)                        AS name_tail,
           strpos(p_name, 'a')                     AS pos_a,
           NULLIF(split_part(p_type, ' ', 2), '')  AS type_word2,
           NULLIF(split_part(p_type, ' ', 9), '')  AS type_word9,
           CAST(length(p_name) AS INT)             AS name_len,
           upper(p_brand)                          AS brand_uc,
           lower(p_type)                           AS type_lc,
           lpad(CAST(p_size AS VARCHAR), 4, '0')   AS size_pad,
           reverse(p_brand)                        AS brand_rev,
           repeat('*', 3)                          AS stars,
           COALESCE(list_position(string_split('STANDARD,SMALL,MEDIUM,LARGE,ECONOMY,PROMO', ','),
                                  split_part(p_type, ' ', 1)), 0) AS type_class_idx
    FROM part
    """,
)
def scalar_string_funcs(spark, sf_dir):
    """String family: LEFT/RIGHT/INSTR/SPLIT_PART/LENGTH/case/LPAD/
    REVERSE/REPEAT/FIND_IN_SET — Doris semantics (split_part → NULL out
    of range; find_in_set → 0 when absent)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        PF.strleft("p_name", 8).alias("name8"),
        PF.strright("p_name", 5).alias("name_tail"),
        PF.instr("p_name", "a").alias("pos_a"),
        PF.split_part("p_type", " ", 2).alias("type_word2"),
        PF.split_part("p_type", " ", 9).alias("type_word9"),
        PF.char_length("p_name").alias("name_len"),
        PF.ucase("p_brand").alias("brand_uc"),
        PF.lcase("p_type").alias("type_lc"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.repeat(F.lit("*"), 3).alias("stars"),
        PF.find_in_set(
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)),
            "STANDARD,SMALL,MEDIUM,LARGE,ECONOMY,PROMO",
        ).alias("type_class_idx"),
    )


@q(
    "scalar_date_format_shim",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')          AS iso_day,
           strftime(o_orderdate, '%d/%b/%Y %H:%M')    AS mysql_style,
           strftime(o_orderdate, '%j')                AS day_of_year,
           strftime(o_orderdate, '%A')                AS weekday_name,
           strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S')              AS ts_roundtrip
    FROM orders
    """,
)
def scalar_date_format_shim(spark, sf_dir):
    """The MySQL ``%``-pattern shim (SURVEY §2.5's named dialect shim):
    Doris ``date_format``/``str_to_date`` patterns translated driver-side
    to Java patterns, checked against DuckDB's C-style strftime."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        PF.date_format("o_orderdate", "%Y-%m-%d").alias("iso_day"),
        PF.date_format("o_orderdate", "%d/%b/%Y %H:%i").alias("mysql_style"),
        PF.date_format("o_orderdate", "%j").alias("day_of_year"),
        PF.date_format("o_orderdate", "%W").alias("weekday_name"),
        PF.str_to_date(
            PF.date_format("o_orderdate", "%Y-%m-%d %H:%i:%s"), "%Y-%m-%d %H:%i:%s"
        ).alias("ts_roundtrip"),
    )


@q(
    "scalar_date_arith",
    """
    SELECT o_orderkey,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
           o_orderdate + INTERVAL 7 DAY    AS plus_week,
           o_orderdate + INTERVAL 2 MONTH  AS plus_2mo,
           date_trunc('month', o_orderdate) AS month_floor,
           CASE WHEN date_trunc('day', o_orderdate) = o_orderdate
                THEN date_trunc('day', o_orderdate)
                ELSE date_trunc('day', o_orderdate) + INTERVAL 1 DAY END AS day_ceil,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 719528
                AS BIGINT) AS mysql_to_days
    FROM orders
    """,
)
def scalar_date_arith(spark, sf_dir):
    """Date arithmetic family: DATEDIFF (MySQL arg order), DAYS_ADD /
    MONTHS_ADD (month-end clamping matches), DATE_FLOOR / DATE_CEIL,
    LAST_DAY, TO_DAYS (MySQL day-zero epoch)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        PF.datediff(F.lit("1998-01-01"), F.col("o_orderdate")).alias("days_to_98"),
        PF.days_add("o_orderdate", 7).alias("plus_week"),
        PF.months_add("o_orderdate", 2).alias("plus_2mo"),
        PF.date_floor("o_orderdate", "month").alias("month_floor"),
        PF.date_ceil("o_orderdate", "day").alias("day_ceil"),
        # cast to timestamp purely for the comparison: pandas renders a
        # DuckDB DATE as midnight datetime64, a Spark DateType as date
        PF.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        PF.to_days("o_orderdate").alias("mysql_to_days"),
    )


@q(
    "scalar_json_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT)    AS k_int,
           json_extract_string(props, '$.k')                 AS k_str,
           CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
           CAST(len(json_keys(props)) AS INT)                AS n_keys,
           json_extract_string(props, '$.missing')           AS missing
    FROM events
    """,
)
def scalar_json_funcs(spark, sf_dir):
    """JSON family over ``events.props``: GET_JSON_INT/STRING/DOUBLE,
    JSON_LENGTH (object key count), missing-path → NULL."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        PF.get_json_int("props", "$.k").alias("k_int"),
        PF.get_json_string("props", "$.k").alias("k_str"),
        PF.get_json_double("props", "$.k").alias("k_dbl"),
        PF.json_length("props").alias("n_keys"),
        PF.get_json_string("props", "$.missing").alias("missing"),
    )


@q(
    "scalar_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * 10.0) / 10.0 AS price_trunc1,
           ((CAST(l_partkey AS BIGINT) % 7) + 7) % 7 AS pk_pmod7,
           upper(to_hex(l_suppkey)) AS sk_hex,
           CASE WHEN l_discount > 0 THEN 1 WHEN l_discount = 0 THEN 0 ELSE -1 END AS disc_sign,
           GREATEST(l_quantity, 25.0) AS qty_hi,
           LEAST(l_quantity, 25.0)    AS qty_lo,
           ABS(l_quantity - 25.0)     AS qty_dev,
           FLOOR(sqrt(l_extendedprice) * 1000000.0) / 1000000.0 AS price_sqrt
    FROM lineitem
    """,
)
def scalar_math_funcs(spark, sf_dir):
    """Math family: TRUNCATE, PMOD, CONV(10→16), SIGN, GREATEST/LEAST,
    ABS, SQRT (floor-quantized — see module docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        PF.truncate("l_extendedprice", 1).alias("price_trunc1"),
        PF.pmod("l_partkey", 7).alias("pk_pmod7"),
        PF.conv(F.col("l_suppkey").cast("string"), 10, 16).alias("sk_hex"),
        F.signum("l_discount").cast("int").alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        (F.floor(F.sqrt("l_extendedprice") * 1e6).cast("double") / 1e6).alias(
            "price_sqrt"
        ),
    )


@q(
    "scalar_array_funcs",
    """
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           CAST(len(w) AS INT)                               AS n_words,
           w[1]                                              AS first_word,
           w[-1]                                             AS last_word,
           array_to_string(list_slice(w, 2, 4), ',')         AS words_2_4,
           array_to_string(list_sort(list_distinct(w)), ',') AS vocab,
           CAST(list_position(w, 'the') AS INT)              AS the_pos,
           list_contains(w, 'the')                           AS has_the
    FROM words
    """,
)
def scalar_array_funcs(spark, sf_dir):
    """Array family over tokenized ``documents.text``: SIZE, ELEMENT_AT
    (1-based + negative), ARRAY_SLICE, ARRAY_DISTINCT+SORT+JOIN,
    ARRAY_POSITION, ARRAY_CONTAINS."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.element_at(w, 1).alias("first_word"),
        F.element_at(w, -1).alias("last_word"),
        F.array_join(PF.array_slice(w, 2, 3), ",").alias("words_2_4"),
        F.array_join(F.array_sort(F.array_distinct(w)), ",").alias("vocab"),
        F.coalesce(F.array_position(w, "the"), F.lit(0)).cast("int").alias("the_pos"),
        F.array_contains(w, "the").alias("has_the"),
    )


@q(
    "scalar_array_higher_order",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0.0)) AS INT) AS n_pos,
           FLOOR(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1000000.0) / 1000000.0 AS sq_norm,
           FLOOR(CAST(list_max(embedding) AS DOUBLE) * 1000000.0) / 1000000.0 AS max_dim,
           FLOOR(CAST(list_min(embedding) AS DOUBLE) * 1000000.0) / 1000000.0 AS min_dim
    FROM embeddings
    """,
)
def scalar_array_higher_order(spark, sf_dir):
    """Higher-order array functions (Doris ARRAY_FILTER/ARRAY_MAP/
    ARRAY_SUM/MIN/MAX as Catalyst lambdas) over ``embeddings.embedding``
    — the dot-product building blocks for similarity search. The fold
    is sequential left-to-right in both engines, so the double sum is
    deterministic; outputs floor-quantized against float-cast noise."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    sq = F.aggregate(
        emb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        PF.array_count(lambda x: x > 0.0, emb).alias("n_pos"),
        (F.floor(sq * 1e6).cast("double") / 1e6).alias("sq_norm"),
        (F.floor(F.array_max(emb).cast("double") * 1e6).cast("double") / 1e6).alias(
            "max_dim"
        ),
        (F.floor(F.array_min(emb).cast("double") * 1e6).cast("double") / 1e6).alias(
            "min_dim"
        ),
    )


@q(
    "scalar_ip_funcs",
    """
    SELECT c_custkey,
           CAST(n % 4294967296 AS BIGINT) AS ip_num,
           concat_ws('.', CAST(CAST(FLOOR(n / 16777216) AS BIGINT) % 256 AS VARCHAR),
                          CAST(CAST(FLOOR(n / 65536)    AS BIGINT) % 256 AS VARCHAR),
                          CAST(CAST(FLOOR(n / 256)      AS BIGINT) % 256 AS VARCHAR),
                          CAST(n % 256 AS VARCHAR)) AS ip_str,
           TRUE AS roundtrip_ok
    FROM (SELECT c_custkey, (c_custkey * 7919) % 4294967296 AS n FROM customer)
    """,
)
def scalar_ip_funcs(spark, sf_dir):
    """IP family: INET_NTOA / INET_ATON round-trip on synthesized IPv4
    numbers (Doris ipv4_num_to_string / ipv4_string_to_num)."""
    c = load_table(spark, sf_dir, "customer")
    n = (F.col("c_custkey") * 7919) % F.lit(4294967296)
    ip = PF.inet_ntoa(n)
    return c.select(
        "c_custkey",
        n.cast("bigint").alias("ip_num"),
        ip.alias("ip_str"),
        (PF.inet_aton(ip) == n).alias("roundtrip_ok"),
    )


@q(
    "scalar_hash_crypto",
    """
    SELECT p_partkey,
           md5(p_name)            AS name_md5,
           sha256(p_name)         AS name_sha256,
           upper(hex(p_brand))    AS brand_hex,
           p_brand                AS brand_unhex_rt,
           TRUE                   AS aes_roundtrip_ok
    FROM part
    """,
)
def scalar_hash_crypto(spark, sf_dir):
    """Hash/crypto family: MD5, SHA2-256, HEX/UNHEX round-trip, and
    AES_ENCRYPT/DECRYPT self-inverse (ciphertext is key-dependent so the
    oracle checks the boolean, not the bytes)."""
    p = load_table(spark, sf_dir, "part")
    key = "0123456789abcdef"
    return p.select(
        "p_partkey",
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("p_name").cast("binary"), 256).alias("name_sha256"),
        F.upper(F.hex(F.col("p_brand"))).alias("brand_hex"),
        F.unhex(F.hex(F.col("p_brand"))).cast("string").alias("brand_unhex_rt"),
        (
            PF.aes_decrypt(PF.aes_encrypt("p_name", key), key).cast("string")
            == F.col("p_name")
        ).alias("aes_roundtrip_ok"),
    )


@q(
    "scalar_sm4_crypto",
    """
    SELECT p_partkey,
           p_name AS decrypted,
           CAST((FLOOR(length(p_name) / 16) + 1) * 16 AS INT) AS ecb_len,
           CAST((FLOOR(length(p_name) / 16) + 1) * 16 AS INT) AS cbc_len,
           TRUE AS modes_differ
    FROM part
    """,
)
def scalar_sm4_crypto(spark, sf_dir):
    """SM4_ENCRYPT/SM4_DECRYPT (GB/T 32907, ECB + CBC with iv): the
    decrypted payload is genuine value parity (must equal the source
    string through a full encrypt→decrypt loop), ciphertext length is
    PKCS#7-deterministic and replayed arithmetically; the kernel itself
    is pinned to the standard test vector in tests/test_functions.py."""
    p = load_table(spark, sf_dir, "part")
    key = "palo-sm4-testkey"
    iv = "palo-sm4-init-iv"
    # two-stage projection: each cipher UDF is evaluated ONCE and its
    # bytes reused by the downstream expressions (a shared non-cheap
    # Python UDF must not be re-run per consumer)
    enc = p.select(
        "p_partkey",
        PF.sm4_encrypt("p_name", key).alias("ecb"),
        PF.sm4_encrypt("p_name", key, iv, "SM4_128_CBC").alias("cbc"),
    )
    return enc.select(
        "p_partkey",
        PF.sm4_decrypt(F.col("ecb"), key).alias("decrypted"),
        F.length("ecb").alias("ecb_len"),
        F.length("cbc").alias("cbc_len"),
        (F.hex("ecb") != F.hex("cbc")).alias("modes_differ"),
    )


@q(
    "scalar_map_funcs",
    """
    SELECT n_nationkey,
           'nk,rk'                                          AS keys_csv,
           CAST(n_nationkey + n_regionkey AS BIGINT)        AS vals_sum,
           TRUE                                             AS has_rk,
           CAST(2 AS INT)                                   AS m_size,
           CAST(n_regionkey AS BIGINT)                      AS rk_val,
           concat('nk=', n_nationkey, ';rk=', n_regionkey)  AS entries_str,
           CAST(3 AS INT)                                   AS concat_size
    FROM nation
    """,
)
def scalar_map_funcs(spark, sf_dir):
    """Map family (Doris 2.0 MAP type): MAP(), MAP_KEYS, MAP_VALUES,
    MAP_CONTAINS_KEY, MAP_SIZE, ELEMENT_AT, MAP_ENTRIES, MAP_CONCAT —
    all native Catalyst map expressions. The oracle recomputes every
    output from the scalar source columns (map construction is ours to
    test; the values it must carry are self-evident)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("nk"), F.col("n_nationkey").cast("bigint"),
        F.lit("rk"), F.col("n_regionkey").cast("bigint"),
    )
    entries = F.transform(
        F.map_entries(m),
        lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
    )
    return n.select(
        "n_nationkey",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("vals_sum"),
        F.map_contains_key(m, "rk").alias("has_rk"),
        F.size(m).alias("m_size"),
        F.element_at(m, F.lit("rk")).alias("rk_val"),
        F.array_join(entries, ";").alias("entries_str"),
        F.size(F.map_concat(m, F.create_map(F.lit("x"), F.lit(1).cast("bigint")))).alias(
            "concat_size"
        ),
    )


@q(
    "scalar_variant_json",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
           MIN(CAST(props->>'$.k' AS INT)) AS min_k,
           MAX(CAST(props->>'$.k' AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def scalar_variant_json(spark, sf_dir):
    """Doris 2.1 VARIANT column, the Spark-first way: ``parse_json`` into
    a real VariantType column (binary semi-structured encoding, NOT a
    string re-parse per access) and typed path extraction with
    ``variant_get`` — the same store-once/extract-typed design as Doris's
    VARIANT subcolumnarization. Aggregates over the extracted int path."""
    e = load_table(spark, sf_dir, "events")
    v = e.withColumn("props_v", F.parse_json(F.col("props")))
    k = F.variant_get(F.col("props_v"), "$.k", "int")
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@q(
    "scalar_time_round_family",
    """
    SELECT event_id,
           CAST(epoch(time_bucket(INTERVAL '15 minutes',
                CAST(date_trunc('second', ts) AS TIMESTAMP),
                TIMESTAMP '1970-01-01 00:00:00')) AS BIGINT) AS floor_15m,
           CAST(epoch(time_bucket(INTERVAL '2 hours',
                CAST(date_trunc('second', ts) AS TIMESTAMP),
                TIMESTAMP '1970-01-01 00:00:00')) AS BIGINT) AS floor_2h,
           CAST(epoch(CASE
                WHEN time_bucket(INTERVAL '15 minutes',
                     CAST(date_trunc('second', ts) AS TIMESTAMP),
                     TIMESTAMP '1970-01-01 00:00:00')
                   = CAST(date_trunc('second', ts) AS TIMESTAMP)
                THEN CAST(date_trunc('second', ts) AS TIMESTAMP)
                ELSE time_bucket(INTERVAL '15 minutes',
                     CAST(date_trunc('second', ts) AS TIMESTAMP),
                     TIMESTAMP '1970-01-01 00:00:00') + INTERVAL '15 minutes'
                END) AS BIGINT) AS ceil_15m,
           CAST(epoch(time_bucket(INTERVAL '3 months',
                CAST(date_trunc('second', ts) AS TIMESTAMP),
                TIMESTAMP '1970-01-01 00:00:00')) AS BIGINT) AS floor_3mo
    FROM events WHERE event_id < 500
    """,
)
def scalar_time_round_family(spark, sf_dir):
    """Doris time_round family (minute/hour/month_floor, minute_ceil)
    as pure timestamp integer arithmetic — N-unit buckets from an
    origin, DuckDB time_bucket semantics. Outputs as epoch seconds so
    the comparison is precision-independent."""
    from palo_spark.functions import time_ceil, time_floor

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    sec = F.date_trunc("second", F.col("ts"))
    return e.select(
        "event_id",
        F.unix_timestamp(time_floor(sec, 15, "minute")).alias("floor_15m"),
        F.unix_timestamp(time_floor(sec, 2, "hour")).alias("floor_2h"),
        F.unix_timestamp(time_ceil(sec, 15, "minute")).alias("ceil_15m"),
        F.unix_timestamp(time_floor(sec, 3, "month")).alias("floor_3mo"),
    )


@q(
    "scalar_date_names",
    """
    SELECT o_orderkey,
           dayname(o_orderdate) AS day_name,
           monthname(o_orderdate) AS month_name,
           CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd,
           CAST(strftime(o_orderdate, '%G') AS INTEGER) * 100
             + CAST(strftime(o_orderdate, '%V') AS INTEGER) AS yw,
           CAST(string_split(o_orderpriority, '-')[1] AS VARCHAR) AS prio_code
    FROM orders WHERE o_orderkey < 500
    """,
)
def scalar_date_names(spark, sf_dir):
    """MySQL date-name surface: DAYNAME / MONTHNAME / WEEKDAY (0=Mon)
    plus SUBSTRING_INDEX — all native expressions."""
    from palo_spark.functions import dayname, monthname, substring_index, weekday, yearweek

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        dayname("o_orderdate").alias("day_name"),
        monthname("o_orderdate").alias("month_name"),
        weekday("o_orderdate").cast("int").alias("wd"),
        yearweek("o_orderdate").alias("yw"),
        substring_index(F.col("o_orderpriority"), "-", 1).alias("prio_code"),
    )


@q(
    "scalar_misc_batch3",
    """
    SELECT n_nationkey,
           CASE WHEN n_name < 'GERMANY' THEN -1
                WHEN n_name > 'GERMANY' THEN 1 ELSE 0 END AS cmp_g,
           base64(encode(n_name)) AS b64,
           decode(from_base64(base64(encode(n_name)))) AS b64_rt,
           3818098067 AS crc_doris,
           n_nationkey << 3 AS shl3,
           (n_nationkey * 1000 + 7) >> 2 AS shr2,
           CASE WHEN n_nationkey < 0 THEN 0
                WHEN n_nationkey >= 25 THEN 6
                ELSE CAST(FLOOR((n_nationkey - 0.0) / 5.0) AS INT) + 1
           END AS bucket,
           FLOOR(cbrt(n_nationkey) * 1e6) / 1e6 AS cb,
           array_to_string(generate_series(1, n_nationkey % 3 + 2), ',') AS seq,
           array_to_string(json_keys('{"' || n_name || '":1, "z":2}'), ',') AS jk,
           array_to_string(list_transform(string_split(n_name, '_'), (x, i) ->
               len(list_filter(string_split(n_name, '_')[1:i], y -> y = x))
           ), ',') AS enum_uniq
    FROM nation
    """,
)
def scalar_misc_batch3(spark, sf_dir):
    """Scalar batch 3: STRCMP, TO/FROM_BASE64, CRC32, BIT_SHIFT_LEFT/
    RIGHT, WIDTH_BUCKET, CBRT, SEQUENCE, JSON_KEYS,
    ARRAY_ENUMERATE_UNIQ. The oracle re-derives each semantic in DuckDB
    dialect (width_bucket/strcmp spelled as CASE — DuckDB lacks the
    functions; crc32 pinned to the zlib-polynomial constant for
    'doris'). cbrt floor-quantized: DuckDB's differs in the last ulp."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        PF.strcmp("n_name", F.lit("GERMANY")).alias("cmp_g"),
        PF.to_base64("n_name").alias("b64"),
        PF.from_base64(PF.to_base64("n_name")).alias("b64_rt"),
        PF.crc32(F.lit("doris")).alias("crc_doris"),
        PF.bit_shift_left("n_nationkey", 3).alias("shl3"),
        PF.bit_shift_right(F.col("n_nationkey") * 1000 + 7, 2).alias("shr2"),
        PF.width_bucket("n_nationkey", 0.0, 25.0, 5).cast("int").alias("bucket"),
        (F.floor(PF.cbrt("n_nationkey") * 1e6) / 1e6).alias("cb"),
        F.array_join(
            PF.sequence(F.lit(1), F.col("n_nationkey") % 3 + 2).cast("array<string>"),
            ",",
        ).alias("seq"),
        F.array_join(
            PF.json_keys(
                F.concat(F.lit('{"'), F.col("n_name"), F.lit('":1, "z":2}'))
            ),
            ",",
        ).alias("jk"),
        F.array_join(
            PF.array_enumerate_uniq(F.split("n_name", "_")).cast("array<string>"), ","
        ).alias("enum_uniq"),
    )


@q(
    "scalar_misc_batch4",
    """
    SELECT o_orderkey,
           lpad(o_orderpriority, 12, '*') AS lp,
           rpad(o_orderpriority, 12, '.') AS rp,
           levenshtein(o_orderpriority, '1-URGENT') AS lev,
           md5(o_orderpriority) AS h_md5,
           sha256(o_orderpriority) AS h_sha2,
           date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS mon_ts,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS monday,
           CAST(o_orderdate AS TIMESTAMP) AS day_rt,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           '''' || replace(replace(o_orderpriority, '\', '\\'), '''', '\''') || '''' AS quoted,
           CAST(o_orderkey % 1000 AS BIGINT) AS ms_rt,
           regexp_extract('http://ex.com/p?k=' || o_orderkey, 'k=([0-9]+)', 1) AS url_k,
           'ex.com' AS dom,
           'http' AS proto,
           FLOOR(degrees(radians(o_totalprice)) * 1e4) / 1e4 AS deg_rt,
           CAST(sign(o_totalprice - 150000.0) AS DOUBLE) AS sgn,
           FLOOR(atan2(o_totalprice, 100000.0) * 1e6) / 1e6 AS at2,
           FLOOR(log2(o_totalprice) * 1e6) / 1e6 AS l2,
           FLOOR(log10(o_totalprice) * 1e6) / 1e6 AS l10,
           CAST(factorial(CAST(o_orderkey % 10 AS INTEGER)) AS BIGINT) AS fact
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def scalar_misc_batch4(spark, sf_dir):
    """Scalar batch 4: LPAD/RPAD, LEVENSHTEIN, MD5/SHA2, Doris
    DATE_TRUNC (reversed arg order vs Spark — the wrapper takes Doris
    order), TO_MONDAY, TO_DAYS/FROM_DAYS roundtrip, QUARTER/DAYOFYEAR,
    QUOTE, millisecond arithmetic roundtrip, EXTRACT_URL_PARAMETER /
    DOMAIN / PROTOCOL, and math natives (degrees∘radians roundtrip,
    SIGN, ATAN2, LOG2/LOG10, FACTORIAL). Everything is a native JVM
    projection — one narrow scan, zero shuffles. Transcendentals
    floor-quantized (libm last-ulp differences across engines)."""
    from palo_spark import functions as PF2

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    ts = F.col("o_orderdate").cast("timestamp")
    url = F.concat(F.lit("http://ex.com/p?k="), F.col("o_orderkey"))
    ms = F.col("o_orderkey") % 1000
    q4 = lambda c: F.floor(c * 1e4).cast("double") / 1e4  # noqa: E731
    q6 = lambda c: F.floor(c * 1e6).cast("double") / 1e6  # noqa: E731
    return o.select(
        "o_orderkey",
        PF2.lpad(F.col("o_orderpriority"), 12, "*").alias("lp"),
        PF2.rpad(F.col("o_orderpriority"), 12, ".").alias("rp"),
        PF2.levenshtein(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("lev"),
        PF2.md5(F.col("o_orderpriority").cast("binary")).alias("h_md5"),
        PF2.sha2(F.col("o_orderpriority").cast("binary"), 256).alias("h_sha2"),
        PF2.date_trunc(ts, "month").alias("mon_ts"),
        PF2.to_monday("o_orderdate").cast("timestamp").alias("monday"),
        PF2.from_days(PF2.to_days("o_orderdate")).cast("timestamp").alias("day_rt"),
        PF2.quarter("o_orderdate").cast("int").alias("qtr"),
        PF2.dayofyear("o_orderdate").cast("int").alias("doy"),
        PF2.quote("o_orderpriority").alias("quoted"),
        PF2.milliseconds_diff(PF2.milliseconds_add(ts, ms), ts).alias("ms_rt"),
        PF2.extract_url_parameter(url, "k").alias("url_k"),
        PF2.url_domain(url).alias("dom"),
        PF2.url_protocol(url).alias("proto"),
        q4(PF2.degrees(PF2.radians("o_totalprice"))).alias("deg_rt"),
        PF2.sign(F.col("o_totalprice") - 150000.0).alias("sgn"),
        q6(PF2.atan2(F.col("o_totalprice"), F.lit(100000.0))).alias("at2"),
        q6(PF2.log2("o_totalprice")).alias("l2"),
        q6(PF2.log10("o_totalprice")).alias("l10"),
        PF2.factorial((F.col("o_orderkey") % 10).cast("int")).alias("fact"),
    )


@q(
    "scalar_misc_batch5",
    r"""
    WITH base AS (
        SELECT n_nationkey, n_name,
               'https://www.' || lower(replace(replace(n_name, ' ', ''), '_', '')) ||
                   '.example.co/p?q=' || n_nationkey AS url,
               DATE '1998-12-01' AS e,
               DATE '1995-03-07' + CAST(n_nationkey * 40 AS INTEGER) AS s,
               '10.' || CAST(n_nationkey AS VARCHAR) || '.3.7' AS ip
        FROM nation
    ), h AS (
        SELECT *, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               regexp_replace(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                              '^www\.', '') AS dww0,
               datediff('day', s, e) AS dd,
               (12 * year(e) + month(e)) - (12 * year(s) + month(s))
                   - CASE WHEN day(e) < day(s) THEN 1 ELSE 0 END AS mc
        FROM base
    )
    SELECT n_nationkey,
           substr(n_name, 1, 1) || 'xyz' || substr(n_name, 5) AS ov,
           CAST(bit_count(n_nationkey) AS INT) AS bc,
           array_to_string([CAST(instr(n_name, 'AN') AS INT),
                            CAST(instr(n_name, 'IA') AS INT),
                            CAST(instr(n_name, 'ZZZ') AS INT)], ',') AS msap,
           CAST(len(list_filter(['uni', 'nit', 'ite', 'ted'],
                g -> contains(lower(n_name), g))) AS DOUBLE) / 4.0 AS ngs,
           'https' AS proto,
           host AS dom,
           dww0 AS dww,
           'co' AS tld,
           'example' AS fsd,
           'example.co' AS cutfsd,
           s + CAST(CASE WHEN (8 - isodow(s)) % 7 = 0 THEN 7
                         ELSE (8 - isodow(s)) % 7 END AS INTEGER) AS nd,
           CAST(FLOOR(mc / 12.0) AS BIGINT) AS ydiff,
           CAST(mc AS BIGINT) AS mdiff,
           CAST(dd // 7 AS BIGINT) AS wdiff,
           CAST(dd * 24 AS BIGINT) AS hdiff,
           CAST(dd * 86400 AS BIGINT) AS sdiff,
           (CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
            + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
            + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
            + CAST(string_split(ip, '.')[4] AS BIGINT)) // 524288
               = (10 * 16777216 + 8 * 65536) // 524288 AS ipr,
           array_to_string([n_name, n_name], ',') AS arep
    FROM h
    """,
)
def scalar_misc_batch5(spark, sf_dir):
    """Scalar batch 5: OVERLAY, BIT_COUNT, MULTI_SEARCH_ALL_POSITIONS,
    NGRAM_SEARCH, URL family (PROTOCOL/DOMAIN/DOMAIN_WITHOUT_WWW/
    TOP_LEVEL_DOMAIN/FIRST_SIGNIFICANT_SUBDOMAIN + CUT), NEXT_DAY,
    YEARS/MONTHS/WEEKS/HOURS/SECONDS_DIFF (complete-unit TIMESTAMPDIFF
    semantics, mirrored in DuckDB via calendar arithmetic),
    IS_IP_ADDRESS_IN_RANGE (10.x.3.7 vs 10.8.0.0/13), ARRAY_REPEAT."""
    n = load_table(spark, sf_dir, "nation")
    url = F.concat(
        F.lit("https://www."),
        F.lower(F.regexp_replace("n_name", "[ _]", "")),
        F.lit(".example.co/p?q="), F.col("n_nationkey").cast("string"),
    )
    b = n.select(
        "n_nationkey", "n_name", url.alias("url"),
        F.lit("1998-12-01").cast("date").alias("e"),
        F.date_add(F.lit("1995-03-07").cast("date"),
                   (F.col("n_nationkey") * 40).cast("int")).alias("s"),
        F.concat(F.lit("10."), F.col("n_nationkey").cast("string"),
                 F.lit(".3.7")).alias("ip"),
    )
    return b.select(
        "n_nationkey",
        PF.overlay("n_name", 2, 3, "xyz").alias("ov"),
        PF.bit_count("n_nationkey").cast("int").alias("bc"),
        F.array_join(
            PF.multi_search_all_positions("n_name", ["AN", "IA", "ZZZ"])
            .cast("array<string>"), ",").alias("msap"),
        PF.ngram_search("n_name", "united", n=3).alias("ngs"),
        PF.protocol("url").alias("proto"),
        PF.domain("url").alias("dom"),
        PF.domain_without_www("url").alias("dww"),
        PF.top_level_domain("url").alias("tld"),
        PF.first_significant_subdomain("url").alias("fsd"),
        PF.cut_to_first_significant_subdomain("url").alias("cutfsd"),
        # cast for comparison only: DuckDB DATE arrives as midnight
        # datetime64 in pandas, Spark DateType as date
        PF.next_day("s", "MO").cast("timestamp").alias("nd"),
        PF.years_diff("e", "s").alias("ydiff"),
        PF.months_diff("e", "s").alias("mdiff"),
        PF.weeks_diff("e", "s").alias("wdiff"),
        PF.hours_diff("e", "s").alias("hdiff"),
        PF.seconds_diff("e", "s").alias("sdiff"),
        PF.is_ip_address_in_range("ip", "10.8.0.0/13").alias("ipr"),
        F.array_join(PF.array_repeat(F.col("n_name"), 2), ",").alias("arep"),
    )


@q(
    "scalar_sub_replace_compress",
    """
    SELECT doc_id,
           substr(source, 1, 2) || 'XY' ||
               substr(source, 2 + 3 + 1) AS sr,
           text AS rt,
           CAST(strlen(text) AS INT) AS n_bytes
    FROM documents WHERE doc_id < 200
    """,
)
def scalar_sub_replace_compress(spark, sf_dir):
    """r7 scalar batch: SUB_REPLACE (positional overwrite, pure native
    concat/substr — whole-stage codegen) value-replayed in DuckDB as
    the substr composition, and the MySQL COMPRESS/UNCOMPRESS pair
    proven by round-trip identity — the oracle's `rt` is the original
    text, which only matches if the 4-byte-length + zlib framing
    decodes losslessly (byte length checked alongside)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        PF.sub_replace("source", "XY", 2, 3).alias("sr"),
        PF.uncompress(PF.compress("text")).alias("rt"),
        F.octet_length("text").cast("int").alias("n_bytes"),
    )
