"""Doris/MySQL-dialect SQL → Spark SQL translation (sql_frontend)."""

import pytest
from pyspark.sql import functions as F

from palo_spark.sql_frontend import translate


def test_percent_patterns_rewritten():
    out = translate("SELECT date_format(d, '%Y-%m-%d %H:%i:%s') FROM t")
    assert "'yyyy-MM-dd HH:mm:ss'" in out


def test_str_to_date_renamed_and_rewritten():
    out = translate("SELECT str_to_date('2020-01-02', '%Y-%m-%d')")
    assert out == "SELECT to_timestamp('2020-01-02', 'yyyy-MM-dd')"


def test_format_arg_must_be_literal():
    with pytest.raises(ValueError, match="string literal"):
        translate("SELECT date_format(d, fmt_col) FROM t")


def test_logical_pipes_and_hash_comment():
    out = translate("SELECT 1 # note\nFROM t WHERE a = 1 || b = 2 && c = 3")
    assert "||" not in out and "&&" not in out and "#" not in out
    assert "OR" in out and "AND" in out and "-- note" in out


def test_pipes_inside_string_untouched():
    out = translate("SELECT '||' AS s, \"a && b\" AS t")
    assert "'||'" in out and "'a && b'" in out


def test_double_quoted_string_to_single():
    assert translate('SELECT "it\'s" AS s') == "SELECT 'it\\'s' AS s"


def test_mysql_limit_offset_form():
    out = translate("SELECT a FROM t ORDER BY a LIMIT 5, 10")
    assert out.endswith("LIMIT 10 OFFSET 5")
    # plain LIMIT untouched
    assert translate("SELECT a FROM t LIMIT 7").endswith("LIMIT 7")


def test_cast_type_mapping():
    assert "AS BIGINT" in translate("SELECT CAST(x AS SIGNED)")
    assert "AS TIMESTAMP" in translate("SELECT CAST(x AS DATETIME)")
    assert "AS STRING" in translate("SELECT CAST(x AS VARCHAR(20))")
    # unmapped types pass through
    assert "DECIMAL(38,0)" in translate("SELECT CAST(x AS DECIMAL(38,0))")


def test_interval_date_add_sub():
    out = translate("SELECT date_add(d, INTERVAL 1 MONTH), date_sub(d, INTERVAL 2 DAY)")
    assert "(d + INTERVAL 1 MONTH)" in out and "(d - INTERVAL 2 DAY)" in out
    # 2-arg day form passes through (Spark shares it)
    assert "date_add(d, 3)" in translate("SELECT date_add(d, 3)")


def test_date_trunc_arg_swap():
    assert "date_trunc('month', d)" in translate("SELECT date_trunc(d, 'month')")
    # Spark arg order (literal first) left alone
    assert "date_trunc('month', d)" in translate("SELECT date_trunc('month', d)")


def test_group_concat_forms():
    out = translate("SELECT group_concat(x) FROM t")
    assert "array_join(collect_list(x), ',')" in out
    out = translate("SELECT group_concat(DISTINCT x, ';' ORDER BY x) FROM t")
    assert "array_join(array_sort(array_distinct(collect_list(x))), ';')" in out
    # r12: a DIFFERENT sort key collects (key, value) structs
    out = translate("SELECT group_concat(x ORDER BY y) FROM t")
    assert ("array_join(transform(array_sort(collect_list(struct(y AS o, "
            "x AS x))), s -> s.x), ',')") in out
    out = translate("SELECT group_concat(x ORDER BY y DESC) FROM t")
    assert out.count("reverse(") == 1
    with pytest.raises(ValueError, match="one sort key"):
        translate("SELECT group_concat(DISTINCT x ORDER BY y) FROM t")


def test_renames_and_templates():
    out = translate("SELECT strleft(s, 2), strright(s, 2), money_format(x), ndv(x), dayname(d)")
    assert "left(s, 2)" in out and "right(s, 2)" in out
    assert "format_number(x, 2)" in out
    assert "approx_count_distinct(x)" in out
    assert "date_format(d, 'EEEE')" in out


def test_nested_calls_translate_inside_out():
    out = translate("SELECT date_format(date_add(d, INTERVAL 1 MONTH), '%Y-%m')")
    assert out == "SELECT date_format((d + INTERVAL 1 MONTH), 'yyyy-MM')"


def test_passthrough_surface():
    text = "SELECT `a` div 2, b % 3, a <=> b FROM `t` WHERE x IN (1, 2)"
    out = translate(text)
    assert "`a` div 2" in out and "% 3" in out and "<=>" in out


def test_trailing_semicolon_stripped():
    assert translate("SELECT 1;") == "SELECT 1"


def test_week_specifiers_translate_to_expressions():
    # r6: %U/%u/%V/%X are computed day-arithmetic expressions (values
    # verified against Python in test_functions.py); a bare %U must
    # translate, not raise
    out = translate("SELECT date_format(d, '%U') AS wk")
    assert "dayofyear" in out and "FLOOR" in out
    out = translate("SELECT date_format(d, '%X-%V')")
    assert out.count("CASE WHEN") >= 2


def test_length_is_bytes():
    out = translate("SELECT length(s), char_length(s) FROM t")
    assert "octet_length(s)" in out and "char_length(s)" in out


def test_join_hint_broadcast_rewritten():
    out = translate(
        "SELECT c_name FROM orders o JOIN [broadcast] `customer` c "
        "ON o_custkey = c_custkey"
    )
    assert "/*+ BROADCAST(c) */" in out
    assert "[" not in out and "]" not in out


def test_join_hint_shuffle_and_nested_block_anchor():
    out = translate(
        "SELECT * FROM a JOIN [shuffle] db.b ON a.k = b.k WHERE x IN "
        "(SELECT y FROM c JOIN [broadcast] (SELECT z FROM d) AS dd "
        "ON c.z = dd.z)"
    )
    # outer hint on the outer SELECT, inner on the subquery's SELECT
    head, _, tail = out.partition("WHERE")
    assert "/*+ SHUFFLE_HASH(b) */" in head
    assert "/*+ BROADCAST(dd) */" in tail


def test_join_hint_alias_resolution():
    # no alias -> table name; AS alias -> alias; db-qualified -> last part
    assert "/*+ BROADCAST(customer) */" in translate(
        "SELECT 1 FROM orders JOIN [broadcast] customer ON 1=1"
    )
    assert "/*+ BROADCAST(c) */" in translate(
        "SELECT 1 FROM orders JOIN [broadcast] customer AS c ON 1=1"
    )


def test_join_hint_unknown_fails_loud():
    with pytest.raises(ValueError, match="join hint"):
        translate("SELECT 1 FROM a JOIN [colocate] b ON a.k = b.k")


def test_join_hint_forces_broadcast_plan(spark):
    """The rewritten hint must actually reach Catalyst: a [broadcast]
    join plans as BroadcastHashJoin even with auto-broadcast disabled."""
    from palo_spark.catalog import register_views
    from palo_spark.sql_frontend import doris_sql

    register_views(spark, "/root/testdata/sf0.001")
    sql = (
        "SELECT o_orderkey, c_name FROM orders o "
        "JOIN [broadcast] customer c ON o_custkey = c_custkey"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = doris_sql(spark, sql)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_match_predicates_translate():
    out = translate("SELECT doc_id FROM documents WHERE `text` MATCH_ANY 'Data Spark'")
    assert "arrays_overlap" in out and "'data'" in out and "`text`" in out
    out = translate("SELECT 1 FROM d WHERE t MATCH_ALL 'a b'")
    assert out.count("array_contains") == 2
    out = translate("SELECT 1 FROM d WHERE t MATCH_PHRASE 'a b'")
    assert "' a b '" in out
    with pytest.raises(ValueError, match="string literal"):
        translate("SELECT 1 FROM d WHERE t MATCH_ANY col2")
    with pytest.raises(ValueError, match="column identifier"):
        translate("SELECT 1 FROM d WHERE (t || u) MATCH_ANY 'x'")


def test_match_sql_equals_operator_semantics(spark):
    """The SQL-text spelling and operators.text.match_any/all/phrase
    must select the same rows on the fixture corpus."""
    from palo_spark.catalog import load_table, register_views
    from palo_spark.operators.text import match_any, match_all, match_phrase
    from palo_spark.sql_frontend import doris_sql

    sf = "/root/testdata/sf0.001"
    register_views(spark, sf)
    docs = load_table(spark, sf, "documents")
    for fn, op in [(match_any, "MATCH_ANY"), (match_all, "MATCH_ALL"),
                   (match_phrase, "MATCH_PHRASE")]:
        want = sorted(
            r["doc_id"] for r in docs.filter(fn("text", "the data")).select("doc_id").collect()
        )
        got = sorted(
            r["doc_id"] for r in doris_sql(
                spark, f"SELECT doc_id FROM documents WHERE text {op} 'the data'"
            ).collect()
        )
        assert got == want, op


def test_lateral_view_generators_translate():
    from palo_spark.sql_frontend import translate

    out = translate("SELECT w FROM t LATERAL VIEW explode_split(s, '.') v AS w")
    assert "explode(split(s, '\\\\.'))" in out  # regex-escaped literal delim
    out = translate("SELECT x FROM t LATERAL VIEW explode_json_array_int(j) v AS x")
    assert "from_json(j, 'array<bigint>')" in out
    out = translate("SELECT n FROM t LATERAL VIEW explode_numbers(k) v AS n")
    assert "sequence(0, (k) - 1)" in out and "ELSE cast(array() AS array<bigint>)" in out


def test_explode_numbers_zero_yields_no_rows(spark):
    from palo_spark.sql_frontend import doris_sql

    spark.range(3).toDF("k").createOrReplaceTempView("t_en")
    rows = doris_sql(
        spark, "SELECT k, n FROM t_en LATERAL VIEW explode_numbers(k) v AS n ORDER BY k, n"
    ).collect()
    assert [(r.k, r.n) for r in rows] == [(1, 0), (2, 0), (2, 1)]


def test_explode_split_regex_delimiter_is_literal(spark):
    from palo_spark.sql_frontend import doris_sql

    spark.createDataFrame([("a.b.c",)], "s string").createOrReplaceTempView("t_es")
    rows = doris_sql(
        spark, "SELECT w FROM t_es LATERAL VIEW explode_split(s, '.') v AS w"
    ).collect()
    assert [r.w for r in rows] == ["a", "b", "c"]


def test_qualify_translates_to_except_wrap():
    from palo_spark.sql_frontend import translate

    out = translate("SELECT g, rank() OVER (ORDER BY v) AS r FROM t QUALIFY r < 2")
    assert out.startswith("SELECT * EXCEPT (__qualify__) FROM (")
    assert "(r < 2) AS __qualify__" in out and out.rstrip().endswith("WHERE __qualify__")


def test_qualify_distinct_fails_loud():
    from palo_spark.sql_frontend import translate
    import pytest as _pt

    with _pt.raises(ValueError, match="DISTINCT"):
        translate("SELECT DISTINCT g FROM t QUALIFY row_number() OVER (ORDER BY g) = 1")


def test_qualify_runtime_both_forms(spark):
    from palo_spark.sql_frontend import doris_sql

    spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 5)], "g int, v int"
    ).createOrReplaceTempView("t_q")
    rows = doris_sql(
        spark,
        "SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn "
        "FROM t_q QUALIFY rn <= 2 ORDER BY g, rn",
    ).collect()
    assert [(r.g, r.v) for r in rows] == [(1, 30), (1, 20), (2, 5)]
    rows = doris_sql(
        spark,
        "SELECT g, v FROM t_q QUALIFY "
        "row_number() OVER (PARTITION BY g ORDER BY v DESC) <= 2 ORDER BY g, v",
    ).collect()
    assert [(r.g, r.v) for r in rows] == [(1, 20), (1, 30), (2, 5)]


# --------------------------------------------------------- property fuzzing
#
# The token-level rewriter's failure mode is a SILENTLY CHANGED query, so
# beyond the fixed fixtures above it gets property-tested: a seeded
# generator builds each statement twice from one random AST — once in
# Doris/MySQL dialect (exercising the rewrites: && || # comments,
# LIMIT o,c, double-quoted strings, CAST(SIGNED/DATETIME), interval
# date_add, group_concat, QUALIFY incl. nesting, LATERAL VIEW
# explode_split/explode_numbers, [broadcast]/[shuffle] join hints,
# strleft/ndv/elt, CASE-wrapped INTERVAL arithmetic, %-formats with
# literal % runs, CTE wraps with QUALIFY inside) — and once in native
# Spark SQL. Both run; row sets must be identical. 420 statements
# (VERDICT r6 advice #7 asks ≥400).


def _fuzz_pair(rng):
    """One random query as (doris_text, spark_text) with identical
    semantics by construction."""
    proj_doris, proj_spark, grouped = [], [], rng.random() < 0.35

    def both(d, s=None):
        proj_doris.append(d)
        proj_spark.append(s if s is not None else d)

    if grouped:
        both("g")
        choices = rng.sample(range(6), k=rng.randint(1, 3))
        for c in sorted(choices):
            if c == 0:
                both("COUNT(*) AS n")
            elif c == 1:
                both("CAST(SUM(k) AS SIGNED) AS sk", "CAST(SUM(k) AS BIGINT) AS sk")
            elif c == 2:
                both(
                    "group_concat(s ORDER BY s) AS gc",
                    "array_join(array_sort(collect_list(s)), ',') AS gc",
                )
            elif c == 3:
                both(
                    "group_concat(DISTINCT s, '|' ORDER BY s) AS gd",
                    "array_join(array_sort(array_distinct(collect_list(s))), '|') AS gd",
                )
            elif c == 4:
                both("ndv(s) AS nd", "approx_count_distinct(s) AS nd")
            else:
                both("MIN(k) + MAX(g) AS mm")
    else:
        both("k")
        choices = rng.sample(range(10), k=rng.randint(1, 3))
        for c in sorted(choices):
            if c == 0:
                both('IF(k % 2 = 0, "even", "odd") AS par',
                     "IF(k % 2 = 0, 'even', 'odd') AS par")
            elif c == 1:
                both("strleft(s, 3) AS sl", "left(s, 3) AS sl")
            elif c == 2:
                both("strright(s, 2) AS sr", "right(s, 2) AS sr")
            elif c == 3:
                n = rng.randint(1, 3)
                both(f"elt({n}, 'a', 'b', 'c') AS e")
            elif c == 4:
                both("CAST(d AS DATETIME) AS dd", "CAST(d AS TIMESTAMP) AS dd")
            elif c == 5:
                n = rng.randint(1, 9)
                both(
                    f"date_add(d, INTERVAL {n} DAY) AS da",
                    f"(d + INTERVAL {n} DAY) AS da",
                )
            elif c == 6:
                both(
                    'date_format(`d`, "%Y-%m") AS ym',
                    "date_format(d, 'yyyy-MM') AS ym",
                )
            elif c == 7:
                both("concat_ws('-', s, s) AS cw")
            elif c == 8:
                # INTERVAL arithmetic inside CASE (r6 advice #7 axis)
                n = rng.randint(1, 5)
                both(
                    f"CASE WHEN k % 3 = 0 THEN date_add(d, INTERVAL {n} DAY) "
                    f"ELSE date_sub(d, INTERVAL 1 DAY) END AS ci",
                    f"CASE WHEN k % 3 = 0 THEN d + INTERVAL {n} DAY "
                    f"ELSE d - INTERVAL 1 DAY END AS ci",
                )
            else:
                # %-format with literal % runs: %% is a literal percent,
                # adjacent to live patterns (r6 advice #7 axis)
                pat_d, pat_s = rng.choice(
                    [
                        ("%Y%%%m", "concat(date_format(d, 'yyyy'), '%', "
                                   "date_format(d, 'MM'))"),
                        ("%%a%%", "'%a%'"),
                        ("%d%%%%x", "concat(date_format(d, 'dd'), '%%x')"),
                    ]
                )
                both(f"date_format(d, '{pat_d}') AS pf", f"{pat_s} AS pf")

    where_d = where_s = ""
    if rng.random() < 0.6:
        lo, hi = sorted(rng.sample(range(0, 40), 2))
        if rng.random() < 0.3:  # IN-list + backticks pass through
            ins = sorted(rng.sample(range(0, 5), 3))
            pred_d = f"`g` IN ({', '.join(map(str, ins))}) && k >= {lo}"
            pred_s = f"g IN ({', '.join(map(str, ins))}) AND k >= {lo}"
        else:
            pred_d = f"(k >= {lo} && k <= {hi}) || g = 0"
            pred_s = f"(k >= {lo} AND k <= {hi}) OR g = 0"
        cmt = "  # trailing note" if rng.random() < 0.3 else ""
        where_d = f" WHERE {pred_d}{cmt}\n"
        where_s = f" WHERE {pred_s}\n"

    lateral_d = lateral_s = ""
    if not grouped and rng.random() < 0.3:
        if rng.random() < 0.5:
            lateral_d = " LATERAL VIEW explode_split(s, '-') lv AS tok"
            lateral_s = " LATERAL VIEW explode(split(s, '-')) lv AS tok"
        else:
            lateral_d = " LATERAL VIEW explode_numbers(3) lv AS num"
            lateral_s = " LATERAL VIEW explode(sequence(0, 2)) lv AS num"
        proj_doris.append("tok" if "tok" in lateral_d else "num")
        proj_spark.append(proj_doris[-1])

    doris = f"SELECT {', '.join(proj_doris)} FROM fz{lateral_d}\n{where_d}"
    sparkq = f"SELECT {', '.join(proj_spark)} FROM fz{lateral_s}\n{where_s}"
    if grouped:
        doris += " GROUP BY g"
        sparkq += " GROUP BY g"
        if rng.random() < 0.4:
            doris += " HAVING COUNT(*) > 2 && `g` < 4"
            sparkq += " HAVING COUNT(*) > 2 AND g < 4"
    elif rng.random() < 0.35 and not lateral_d:
        n = rng.randint(1, 3)
        doris += f" QUALIFY row_number() OVER (PARTITION BY g ORDER BY k) <= {n}"
        # QUALIFY runs the window on WHERE survivors of the base table,
        # so the native equivalent windows over fz, then projects
        sparkq = (
            f"SELECT {', '.join(proj_spark)} FROM (SELECT *, row_number() "
            f"OVER (PARTITION BY g ORDER BY k) AS __rn FROM fz\n{where_s}) b "
            f"WHERE __rn <= {n}"
        )

    if rng.random() < 0.4:
        off, cnt = rng.randint(0, 5), rng.randint(1, 8)
        # total order: all output ordinals ((k) resp. (k, tok) resp. (g)
        # is unique by construction) so LIMIT/OFFSET picks one row set
        order = ", ".join(str(j) for j in range(1, len(proj_doris) + 1))
        doris += f" ORDER BY {order} LIMIT {off}, {cnt}"
        sparkq += f" ORDER BY {order} LIMIT {cnt} OFFSET {off}"

    # nested-block wrap: the translator must recurse into subqueries and
    # CTE bodies (incl. a QUALIFY inside the CTE — r6 advice #7 axis)
    if rng.random() < 0.3:
        key = "g" if grouped else "k"
        if rng.random() < 0.5:
            doris = f"SELECT * FROM ({doris}) sub WHERE `{key}` >= 0"
            sparkq = f"SELECT * FROM ({sparkq}) sub WHERE {key} >= 0"
        else:
            doris = f"WITH c AS ({doris}) SELECT * FROM c WHERE `{key}` >= 0"
            sparkq = f"WITH c AS ({sparkq}) SELECT * FROM c WHERE {key} >= 0"

    # random join-hint wrapper: same rows, exercises the hint rewriter
    if rng.random() < 0.25:
        hint = rng.choice(["broadcast", "shuffle"])
        spark_hint = "BROADCAST" if hint == "broadcast" else "SHUFFLE_HASH"
        doris = (
            f"SELECT q.*, dim.tag FROM ({doris}) q JOIN [{hint}] dim "
            f"ON q.{'g' if grouped else 'k'} % 2 = dim.pk"
        )
        sparkq = (
            f"SELECT /*+ {spark_hint}(dim) */ q.*, dim.tag FROM ({sparkq}) q "
            f"JOIN dim ON q.{'g' if grouped else 'k'} % 2 = dim.pk"
        )
    return doris, sparkq


def test_fuzz_translate_matches_native_spark(spark):
    import random

    from palo_spark.sql_frontend import doris_sql

    spark.createDataFrame(
        [(i, i % 5, f"ab-cd-{i % 7}x") for i in range(40)],
        "k int, g int, s string",
    ).withColumn(
        "d", F.to_timestamp(F.lit("2024-03-05 10:00:00")) + F.make_interval(days=F.col("k"))
    ).createOrReplaceTempView("fz")
    spark.createDataFrame([(0, "z"), (1, "o")], "pk int, tag string").createOrReplaceTempView("dim")

    rng = random.Random(20260814)
    mismatches = []
    for i in range(420):
        doris, sparkq = _fuzz_pair(rng)
        try:
            got = sorted(map(tuple, doris_sql(spark, doris).collect()))
            want = sorted(map(tuple, spark.sql(sparkq).collect()))
        except Exception as e:  # a translation that breaks parsing is a bug too
            mismatches.append((i, doris, sparkq, repr(e)))
            continue
        if got != want:
            mismatches.append((i, doris, sparkq, f"{got[:3]} != {want[:3]}"))
    assert not mismatches, mismatches[:3]


def test_fuzz_multi_statement_scripts(spark):
    """Multi-statement ``;`` scripts through ``PaloSession.sql`` (r6
    advice #7 axis): the mysql-client batch shape sends several
    statements to the one entry point; sql() must run each in order and
    return the LAST result, with ``;`` inside string literals and
    subqueries left alone. 40 random 2-3 statement scripts whose final
    statement mirrors a native Spark query."""
    import random

    from palo_spark.palo_session import PaloSession

    spark.createDataFrame(
        [(i, i % 5, f"ab-cd-{i % 7}x") for i in range(40)],
        "k int, g int, s string",
    ).withColumn(
        "d",
        F.to_timestamp(F.lit("2024-03-05 10:00:00"))
        + F.make_interval(days=F.col("k")),
    ).createOrReplaceTempView("fz")
    spark.createDataFrame(
        [(0, "z"), (1, "o")], "pk int, tag string"
    ).createOrReplaceTempView("dim")

    ps = PaloSession(spark)
    rng = random.Random(7_2026)
    mismatches = []
    for i in range(40):
        doris, sparkq = _fuzz_pair(rng)
        lead = rng.sample(
            [
                "SELECT 1 AS probe",
                "SELECT ';' AS semi_in_string",  # ; inside a literal
                "SELECT k FROM fz WHERE k IN (SELECT 3) LIMIT 1",
                "SELECT COUNT(*) AS c FROM fz",
                # r8 splitter hardening: ';' inside comments and
                # escaped literals must not fragment the statement
                "SELECT 2 AS probe2 -- trailing; note\n",
                "SELECT /* block; comment */ 3 AS probe3",
                "SELECT 'it''s;ok' AS esc",
            ],
            k=rng.randint(1, 3),
        )
        script = ";\n".join(lead + [doris]) + (";" if rng.random() < 0.5 else "")
        try:
            got = sorted(map(tuple, ps.sql(script).collect()))
            want = sorted(map(tuple, spark.sql(sparkq).collect()))
        except Exception as e:
            mismatches.append((i, script, repr(e)))
            continue
        if got != want:
            mismatches.append((i, script, f"{got[:3]} != {want[:3]}"))
    assert not mismatches, mismatches[:2]


def test_timestampdiff_month_semantics_mysql(spark):
    """timestampdiff(MONTH/.../YEAR) through the SQL-text PASSTHROUGH is
    MySQL-faithful on Spark 4 (complete units by day-of-month
    comparison, no month-end clamping) — pinned on the edges, plus a
    grid equivalence against the explicit functions._months_complete
    form, so a future Spark regression would fail here."""
    from palo_spark.functions import timestampdiff as my_tsdiff
    from palo_spark.sql_frontend import doris_sql

    r = doris_sql(spark, """
        SELECT timestampdiff(MONTH, CAST('2024-01-31' AS DATETIME),
                             CAST('2024-02-29' AS DATETIME)) AS m_clamp,
               timestampdiff(MONTH, CAST('2023-01-31' AS DATETIME),
                             CAST('2023-02-28' AS DATETIME)) AS m_clamp2,
               timestampdiff(MONTH, CAST('2024-03-31' AS DATETIME),
                             CAST('2024-01-31' AS DATETIME)) AS m_neg,
               timestampdiff(YEAR, CAST('2020-02-29' AS DATETIME),
                             CAST('2021-02-28' AS DATETIME)) AS y_edge,
               timestampdiff(DAY, CAST('2024-01-01' AS DATETIME),
                             CAST('2024-01-08' AS DATETIME)) AS d_plain
    """).collect()[0]
    assert (r.m_clamp, r.m_clamp2, r.m_neg, r.y_edge, r.d_plain) == (0, 0, -2, 0, 7)
    grid = spark.range(500).select(
        (F.to_timestamp(F.lit("2019-01-28 00:00:00"))
         + F.make_interval(days=(F.col("id") * 7919) % 1500)).alias("s"),
        (F.to_timestamp(F.lit("2020-06-15 00:00:00"))
         + F.make_interval(days=(F.col("id") * 104729) % 1500,
                           hours=(F.col("id") * 31) % 24)).alias("e"),
    )
    assert grid.filter(
        F.expr("timestampdiff(MONTH, s, e)") != my_tsdiff("month", "s", "e")
    ).count() == 0


def test_lambda_first_array_hofs_translate():
    """Doris puts the lambda FIRST in higher-order array functions;
    Spark's transform/filter/exists/zip_with put it LAST."""
    from palo_spark.sql_frontend import translate

    assert translate(
        "SELECT array_map(x -> x * 2, ARRAY(1,2)) AS a"
    ) == "SELECT transform(ARRAY(1,2), x -> x * 2) AS a"
    assert translate(
        "SELECT array_map((x, y) -> x + y, a1, a2) AS s"
    ) == "SELECT zip_with(a1, a2, (x, y) -> x + y) AS s"
    assert translate(
        "SELECT array_filter(x -> x > 1, qs) AS f"
    ) == "SELECT filter(qs, x -> x > 1) AS f"
    assert translate(
        "SELECT array_exists(x -> x > 2, qs) AS e"
    ) == "SELECT exists(qs, x -> x > 2) AS e"
    assert translate(
        "SELECT array_count(x -> x % 2 = 0, qs) AS c"
    ) == "SELECT size(filter(qs, x -> x % 2 = 0)) AS c"
    # lambda bodies with nested calls/commas survive the arg surgery
    assert translate(
        "SELECT array_map(x -> coalesce(x, 0), qs) AS a"
    ) == "SELECT transform(qs, x -> coalesce(x, 0)) AS a"
    import pytest as _pt

    with _pt.raises(ValueError, match="array_map"):
        translate("SELECT array_map(x -> x, a, b, c) AS bad")


def test_json_function_family(spark):
    """Doris JSON functions on Spark's variant toolkit; json_extract
    keeps JSON text (quoted strings), typed variants cast."""
    from palo_spark.sql_frontend import doris_sql

    def one(s):
        return doris_sql(spark, s).collect()[0][0]

    assert one("""SELECT json_extract('{"a": "x"}', '$.a') AS j""") == '"x"'
    assert one("""SELECT json_extract('{"a":{"b":[1,2]}}', '$.a.b') AS j""") == "[1,2]"
    assert one("""SELECT json_extract_string('{"a": "x"}', '$.a') AS j""") == "x"
    assert one("""SELECT json_extract_int('{"n": 7}', '$.n') AS j""") == 7
    assert one("""SELECT json_extract_bool('{"b": true}', '$.b') AS j""") is True
    assert one("""SELECT json_unquote('"x"') AS j""") == "x"
    assert one("""SELECT json_unquote('plain') AS j""") == "plain"
    assert one("""SELECT json_valid('{bad') AS j""") == 0
    assert one("""SELECT json_valid(NULL) AS j""") is None
    assert one("""SELECT json_length('{"a":1,"b":2}') AS j""") == 2
    assert one("""SELECT json_length('{"a":[1,2,3]}', '$.a') AS j""") == 3
    assert one("""SELECT json_keys('{"a":1,"b":2}') AS j""") == '["a","b"]'
    assert one("""SELECT json_contains('[1,2,3]', '2') AS j""") is True
    assert one("""SELECT json_contains('[1,2,3]', '5') AS j""") is False
    assert one("""SELECT json_object('a', 1, 'b', 'x') AS j""") == '{"a":1,"b":"x"}'
    assert one("""SELECT json_array(1, 'a', true) AS j""") == '[1,"a",true]'
    assert one("""SELECT json_quote('hi') AS j""") == '"hi"'
    import pytest as _pt

    with _pt.raises(ValueError, match="string literals"):
        doris_sql(spark, "SELECT json_object(k, 1) AS j")


def test_group_concat_separator_keyword(spark):
    from palo_spark.sql_frontend import doris_sql

    spark.createDataFrame(
        [(1, "a"), (1, "c"), (1, "a")], "k int, s string"
    ).createOrReplaceTempView("gct")
    got = doris_sql(
        spark,
        "SELECT group_concat(DISTINCT s ORDER BY s SEPARATOR '|') AS g "
        "FROM gct GROUP BY k",
    ).collect()[0][0]
    assert got == "a|c"


def test_date_arith_week_strcmp_family(spark):
    """Doris <unit>s_add/_sub (timestampadd — preserves time-of-day),
    to_monday, WEEK/YEARWEEK modes 0 and 3, strcmp,
    append_trailing_char_if_absent."""
    import datetime as dt

    from palo_spark.sql_frontend import doris_sql

    def one(s):
        return doris_sql(spark, s).collect()[0][0]

    assert one("SELECT months_add('2024-03-15 10:30:00', 1) AS d") == dt.datetime(2024, 4, 15, 10, 30)
    assert one("SELECT years_sub('2024-03-15', 1) AS d") == dt.datetime(2023, 3, 15)
    assert one("SELECT weeks_add('2024-03-15', 2) AS d") == dt.datetime(2024, 3, 29)
    assert one("SELECT hours_add('2024-03-15 01:00:00', 25) AS d") == dt.datetime(2024, 3, 16, 2, 0)
    assert one("SELECT to_monday('2024-03-15') AS d") == dt.date(2024, 3, 11)
    # MySQL mode-0 week: Jan 6 '24 precedes the first Sunday -> week 0
    assert one("SELECT week('2024-01-06') AS w") == 0
    assert one("SELECT week('2024-01-07') AS w") == 1
    assert one("SELECT week('2024-03-15') AS w") == 10
    assert one("SELECT week('2024-03-15', 3) AS w") == 11
    assert one("SELECT yearweek('2024-03-15') AS yw") == 202410
    assert one("SELECT yearweek('2024-01-05') AS yw") == 202353  # prev year's week 53
    assert one("SELECT strcmp('a', 'b') AS s") == -1
    assert one("SELECT strcmp(NULL, 'b') AS s") is None
    assert one("SELECT append_trailing_char_if_absent('a/b', '/') AS a") == "a/b/"
    import pytest as _pt

    with _pt.raises(ValueError, match="modes 0"):
        doris_sql(spark, "SELECT week('2024-03-15', 2) AS w")


def test_vector_distance_and_bitmap_sql_family(spark):
    from palo_spark.sql_frontend import doris_sql

    def one(s):
        return doris_sql(spark, s).collect()[0][0]

    assert one("SELECT inner_product(ARRAY(1.0,2.0), ARRAY(3.0,4.0)) AS x") == 11.0
    assert one("SELECT l2_distance(ARRAY(0.0,0.0), ARRAY(3.0,4.0)) AS x") == 5.0
    assert one("SELECT l1_distance(ARRAY(1.0,2.0), ARRAY(3.0,5.0)) AS x") == 5.0
    assert abs(one("SELECT cosine_distance(ARRAY(1.0,0.0), ARRAY(0.0,1.0)) AS x") - 1.0) < 1e-12
    # bitmap family: SQL-surface bitmaps are sorted distinct BIGINT arrays
    assert one("SELECT bitmap_to_string(bitmap_from_string('3,1,2,2')) AS b") == "1,2,3"
    assert one("SELECT bitmap_count(bitmap_from_string('1,2,3')) AS b") == 3
    assert one(
        "SELECT bitmap_to_string(bitmap_xor(bitmap_from_string('1,2'), "
        "bitmap_from_string('2,4'))) AS b"
    ) == "1,4"
    assert one(
        "SELECT bitmap_has_all(bitmap_from_string('1,2,3'), "
        "bitmap_from_string('1,2')) AS b"
    ) is True
    spark.createDataFrame([(1,), (2,), (1,)], "k int").createOrReplaceTempView("bmt")
    assert one("SELECT bitmap_union_count(to_bitmap(k)) AS b FROM bmt") == 2
    assert one("SELECT bitmap_to_string(bitmap_union(to_bitmap(k))) AS b FROM bmt") == "1,2"


def test_aggregate_surface_additions(spark):
    """group_bit_*, avg_weighted, multi_distinct_*, sum0, topn,
    bitmap_intersect (AND-merge aggregate)."""
    from palo_spark.sql_frontend import doris_sql

    spark.createDataFrame(
        [(1, 3), (2, 5), (3, 6), (1, 3)], "k int, v int"
    ).createOrReplaceTempView("aggt")

    def one(s):
        return doris_sql(spark, s).collect()[0][0]

    assert one("SELECT group_bit_and(v) AS a FROM aggt") == 0
    assert one("SELECT group_bit_or(v) AS a FROM aggt") == 7
    assert one("SELECT avg_weighted(v, k) AS a FROM aggt") == (3 + 10 + 18 + 3) / 7
    assert one("SELECT multi_distinct_count(v) AS a FROM aggt") == 3
    assert one("SELECT multi_distinct_sum(v) AS a FROM aggt") == 14
    assert one("SELECT sum0(v) AS a FROM aggt WHERE v > 100") == 0
    assert one("SELECT topn(v, 2) AS a FROM aggt") == '{"3":2,"5":1}'
    assert one(
        "SELECT bitmap_to_string(bitmap_intersect(bitmap_from_string(s))) AS a "
        "FROM (SELECT '1,2,3' AS s UNION ALL SELECT '2,3,4')"
    ) == "2,3"
    assert one("SELECT percentile_array(v, ARRAY(0.0, 1.0)) AS a FROM aggt") == [3.0, 6.0]


def test_url_mask_misc_string_functions(spark):
    from palo_spark.sql_frontend import doris_sql

    def one(s):
        return doris_sql(spark, s).collect()[0][0]

    assert one("SELECT domain('https://a.b.com/x?y=1') AS d") == "a.b.com"
    assert one("SELECT domain_without_www('https://www.b.com/x') AS d") == "b.com"
    assert one("SELECT protocol('https://a.b.com/x') AS p") == "https"
    assert one("SELECT top_level_domain('https://a.b.com/x') AS t") == "com"
    assert one(
        "SELECT extract_url_parameter('http://a.com/?k1=v1&k2=v2', 'k2') AS e"
    ) == "v2"
    assert one("SELECT mask_first_n('abc123', 3) AS m") == "xxx123"
    assert one("SELECT mask_last_n('abc123', 3) AS m") == "abcnnn"
    assert one("SELECT mask_first_n('abcdef') AS m") == "xxxxef"  # default n=4
    assert one("SELECT null_or_empty('') AS n") is True
    assert one("SELECT null_or_empty('x') AS n") is False
    assert one("SELECT from_base64(to_base64('hi')) AS b") == "hi"
    assert one("SELECT digital_masking(13812345678) AS d") == "138****5678"
    assert one("SELECT starts_with('hello', 'he') AS s") is True
    assert one("SELECT ends_with('hello', 'lo') AS s") is True
    assert one(
        "SELECT multi_search_all_positions('hello', ARRAY('l', 'he', 'z')) AS m"
    ) == [3, 1, 0]
    assert one("SELECT bit_shift_left(1, 3) AS b") == 8
    assert one("SELECT bit_shift_right(8, 3) AS b") == 1


def test_date_round_diff_conversion_family(spark):
    """<unit>_floor/_ceil on the origin-anchored period grid,
    complete-unit <unit>s_diff, convert_tz, MySQL day numbers,
    time<->seconds, makedate, epoch conversions."""
    import datetime as dt

    from palo_spark.sql_frontend import doris_sql

    def one(s):
        return doris_sql(spark, s).collect()[0][0]

    assert one("SELECT hour_floor('2024-01-01 12:34:56') AS h") == dt.datetime(2024, 1, 1, 12, 0)
    assert one("SELECT day_ceil('2024-01-01 12:34:56') AS d") == dt.datetime(2024, 1, 2)
    assert one("SELECT day_ceil('2024-01-01 00:00:00') AS d") == dt.datetime(2024, 1, 1)
    assert one("SELECT minute_floor('2024-01-01 12:34:56', 5) AS m") == dt.datetime(2024, 1, 1, 12, 30)
    assert one(
        "SELECT minute_ceil('2024-01-01 12:31:00', 15, '2024-01-01 12:00:00') AS m"
    ) == dt.datetime(2024, 1, 1, 12, 45)
    assert one(
        "SELECT date_floor('2024-01-01 12:34:56', INTERVAL 5 MINUTE) AS d"
    ) == dt.datetime(2024, 1, 1, 12, 30)
    assert one(
        "SELECT convert_tz('2024-01-01 12:00:00', 'UTC', 'Asia/Shanghai') AS c"
    ) == dt.datetime(2024, 1, 1, 20, 0)
    assert one("SELECT to_days('1970-01-01') AS t") == 719528
    assert one("SELECT from_days(739251) AS f") == dt.date(2024, 1, 1)
    assert one("SELECT time_to_sec('01:02:03') AS t") == 3723
    assert one("SELECT sec_to_time(3723) AS s") == "01:02:03"
    assert one("SELECT makedate(2024, 75) AS m") == dt.date(2024, 3, 15)
    assert one("SELECT makedate(2024, 0) AS m") is None
    assert one("SELECT second_timestamp('2024-01-01 00:00:00') AS s") == 1704067200
    # complete-unit diffs (NOT boundary crossings)
    assert one("SELECT months_diff('2024-03-15', '2024-01-10') AS m") == 2
    assert one("SELECT months_diff('2024-02-01', '2024-01-31') AS m") == 0
    assert one("SELECT hours_diff('2024-01-01 05:00:00', '2024-01-01 01:30:00') AS h") == 3


def test_array_map_surface_additions(spark):
    """array_enumerate/cum_sum/slice/concat/zip/push/pop/
    with_constant/first/last(+_index)/range/countequal/apply and the
    map_* completions — all 1-based, all native compositions."""
    from palo_spark.sql_frontend import doris_sql

    def one(s):
        return doris_sql(spark, s).collect()[0][0]

    assert one("SELECT array_enumerate(ARRAY('a','b')) AS e") == [1, 2]
    assert one("SELECT array_cum_sum(ARRAY(1,2,3)) AS c") == [1, 3, 6]
    assert one("SELECT array_slice(ARRAY(1,2,3,4), 2, 2) AS s") == [2, 3]
    assert one("SELECT array_pushfront(ARRAY(2,3), 1) AS p") == [1, 2, 3]
    assert one("SELECT array_popfront(ARRAY(1)) AS p") == []
    assert one("SELECT array_popback(ARRAY(1,2,3)) AS p") == [1, 2]
    assert one("SELECT array_with_constant(3, 'x') AS w") == ["x", "x", "x"]
    assert one("SELECT array_first(x -> x > 1, ARRAY(1,2,3)) AS f") == 2
    assert one("SELECT array_first(x -> x > 9, ARRAY(1,2,3)) AS f") is None
    assert one("SELECT array_last(x -> x > 1, ARRAY(1,2,3)) AS l") == 3
    assert one("SELECT array_first_index(x -> x > 1, ARRAY(1,2,3)) AS f") == 2
    assert one("SELECT array_last_index(x -> x > 9, ARRAY(1,2,3)) AS l") == 0
    assert one("SELECT array_range(5) AS r") == [0, 1, 2, 3, 4]
    assert one("SELECT array_range(1, 10, 2) AS r") == [1, 3, 5, 7, 9]
    assert one("SELECT countequal(ARRAY(1,2,2,3), 2) AS c") == 2
    assert one("SELECT array_apply(ARRAY(1,2,3), '>=', 2) AS a") == [2, 3]
    assert one("SELECT map_contains_value(map('a',1), 1) AS c") is True
    assert one("SELECT map_size(map('a',1)) AS s") == 1


def test_array_sequence_empty_inputs(spark):
    """Spark's sequence(a, b) counts DOWN when b < a — the empty /
    zero-size inputs must yield [] (r10c3 review fix)."""
    from palo_spark.sql_frontend import doris_sql

    def one(s):
        return doris_sql(spark, s).collect()[0][0]

    assert one("SELECT array_enumerate(array()) AS e") == []
    assert one("SELECT array_cum_sum(CAST(array() AS ARRAY<BIGINT>)) AS c") == []
    assert one("SELECT array_range(0) AS r") == []
    assert one("SELECT array_range(5, 5) AS r") == []
    assert one("SELECT array_range(7, 3) AS r") == []
    assert one("SELECT array_range(3, 4) AS r") == [3]


def test_math_function_completions(spark):
    from palo_spark.sql_frontend import doris_sql

    def one(s):
        return doris_sql(spark, s).collect()[0][0]

    assert one("SELECT truncate(3.14159, 2) AS t") == 3.14
    assert one("SELECT truncate(-3.14159, 2) AS t") == -3.14  # toward zero
    assert one("SELECT truncate(314.159, -2) AS t") == 300.0
    assert float(one("SELECT round_bankers(2.5) AS r")) == 2.0
    assert float(one("SELECT round_bankers(3.5) AS r")) == 4.0
    assert one("SELECT dsqrt(16.0) AS d") == 4.0
    assert one("SELECT dpow(2.0, 3.0) AS d") == 8.0
    assert float(one("SELECT fmod(7.5, 2.0) AS f")) == 1.5
    assert one("SELECT nullable(5) AS n") == 5
    assert one("SELECT non_nullable(5) AS n") == 5


def test_group_concat_order_by_other_key(spark, tmp_path):
    """`GROUP_CONCAT(x ORDER BY y [DESC])` with a DIFFERENT sort key
    ([docs: group_concat]): values sort by the key (value as the
    deterministic tie-break), DESC reverses, DISTINCT with a foreign
    key refuses (ambiguous dedup), multi-key refuses."""
    import pytest

    from palo_spark.sql_frontend import doris_sql

    spark.createDataFrame(
        [(1, "a", 30, "x"), (2, "a", 10, "y"), (3, "a", 20, "z"),
         (4, "b", 5, "q")],
        "k int, g string, v int, nm string",
    ).createOrReplaceTempView("gco")
    got = {
        (r["g"], r["s"]) for r in doris_sql(
            spark,
            "SELECT g, GROUP_CONCAT(nm ORDER BY v SEPARATOR '|') AS s "
            "FROM gco GROUP BY g",
        ).collect()
    }
    assert got == {("a", "y|z|x"), ("b", "q")}
    got = {
        (r["g"], r["s"]) for r in doris_sql(
            spark,
            "SELECT g, GROUP_CONCAT(nm ORDER BY v DESC SEPARATOR '|') "
            "AS s FROM gco GROUP BY g",
        ).collect()
    }
    assert got == {("a", "x|z|y"), ("b", "q")}
    with pytest.raises(ValueError, match="one sort key"):
        doris_sql(spark, "SELECT g, GROUP_CONCAT(DISTINCT nm ORDER BY v) "
                         "AS s FROM gco GROUP BY g")
    with pytest.raises(ValueError, match="one sort key"):
        doris_sql(spark, "SELECT g, GROUP_CONCAT(nm ORDER BY v, k) AS s "
                         "FROM gco GROUP BY g")


def test_json_path_operators_and_typed_getters(spark):
    """MySQL/Doris `->` (json_extract: JSON text, strings stay quoted)
    and `->>` (unquoting), the typed get_json_int/bigint/double
    casts, and split_by_string's literal-delimiter split — all at the
    SQL surface."""
    import pytest

    from palo_spark.sql_frontend import doris_sql, translate

    spark.createDataFrame(
        [(1, '{"a": 5, "s": "hi"}')], "k int, j string"
    ).createOrReplaceTempView("jops")
    r = doris_sql(
        spark,
        "SELECT j->'$.a' AS a, j->'$.s' AS qs, j->>'$.s' AS us, "
        "get_json_int(j, '$.a') AS i, get_json_double(j, '$.a') AS d "
        "FROM jops",
    ).collect()[0]
    assert (r["a"], r["qs"], r["us"], r["i"], r["d"]) == (
        "5", '"hi"', "hi", 5, 5.0)
    r2 = doris_sql(
        spark,
        "SELECT split_by_string('a.b.c', '.') AS p, "
        "split_by_string('x||y', '||') AS q",
    ).collect()[0]
    assert (list(r2["p"]), list(r2["q"])) == (["a", "b", "c"], ["x", "y"])
    # arithmetic minus/greater-than sequences stay untouched
    assert "->" not in translate("SELECT a - b, a > b FROM t")
    # lambda arrows (Spark higher-order functions) pass through, even
    # with a string-literal body — only '$'-path literals read as JSON
    out = translate("SELECT array_first(x -> x > 1, ARRAY(1,2)) AS f")
    assert "x -> x > 1" in out.replace("  ", " ")
    out = translate("SELECT transform(a, x -> 'y') FROM t")
    assert "-> 'y'" in out
    with pytest.raises(ValueError, match="JSON path"):
        translate("SELECT j->>k FROM jops")


def test_retention_map_agg_bitmap_agg_ignore_nulls(spark):
    """r12 batch-5 SQL-surface additions: RETENTION (conditional
    aggregation array), MAP_AGG (map per group; duplicate keys fail
    loud under Spark's dedup policy), BITMAP_AGG (== bitmap_union over
    to_bitmap), and FIRST_VALUE/LAST_VALUE with Doris's in-paren
    IGNORE NULLS."""
    from palo_spark.sql_frontend import doris_sql

    spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", None)],
        "k int, g string, v int",
    ).createOrReplaceTempView("b5")
    got = {
        (row["g"], tuple(row["r"])) for row in doris_sql(
            spark,
            "SELECT g, retention(v > 0, v > 25) AS r FROM b5 GROUP BY g",
        ).collect()
    }
    assert got == {("a", (1, 0)), ("b", (1, 1))}
    r = doris_sql(
        spark, "SELECT bitmap_count(bitmap_agg(k)) AS c FROM b5"
    ).collect()[0]["c"]
    assert r == 4
    r = doris_sql(
        spark,
        "SELECT map_agg(g, k) AS m FROM b5 WHERE k IN (1, 3)",
    ).collect()[0]["m"]
    assert r == {"a": 1, "b": 3}
    rows = doris_sql(
        spark,
        "SELECT k, FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY k DESC) "
        "AS f FROM b5",
    ).collect()
    assert {(r["k"], r["f"]) for r in rows} == {
        (4, None), (3, 30), (2, 30), (1, 30)}
