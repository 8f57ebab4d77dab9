"""Unit tests for the Doris-name scalar stdlib (palo_spark/functions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from palo_spark import functions as PF
from palo_spark.functions.datetime_shim import mysql_pattern_to_spark


# ---------------------------------------------------- pattern translation


@pytest.mark.parametrize(
    ("mysql", "spark_pat"),
    [
        ("%Y-%m-%d %H:%i:%s", "yyyy-MM-dd HH:mm:ss"),
        ("%d/%b/%Y", "dd/MMM/yyyy"),
        ("%Y%m%d", "yyyyMMdd"),
        ("%H:%i", "HH:mm"),
        ("%T", "HH:mm:ss"),
        ("%r", "hh:mm:ss a"),
        ("%W, %M %e, %Y", "EEEE, MMMM d, yyyy"),
        ("%%", "%"),
        ("%Y-%m-%dT%H", "yyyy-MM-dd'T'HH"),  # literal letter quoted
        ("week %j of %y", "'week 'DDD' of 'yy"),
    ],
)
def test_mysql_pattern_to_spark(mysql, spark_pat):
    assert mysql_pattern_to_spark(mysql) == spark_pat


def test_mysql_pattern_unsupported_raises():
    with pytest.raises(ValueError, match="%D"):
        mysql_pattern_to_spark("%D of %M")


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# ------------------------------------------------------------ round trips


def test_date_format_and_back(spark):
    ts = F.lit("2024-02-29 23:05:09").cast("timestamp")
    assert _one(spark, PF.date_format(ts, "%Y-%m-%d %H:%i:%s")) == "2024-02-29 23:05:09"
    assert _one(spark, PF.date_format(ts, "%d/%b/%y %p")) == "29/Feb/24 PM"
    rt = _one(spark, PF.str_to_date(PF.date_format(ts, "%Y-%m-%d %H:%i:%s"), "%Y-%m-%d %H:%i:%s"))
    assert rt.isoformat() == "2024-02-29T23:05:09"


def test_date_ceil_on_boundary_is_identity(spark):
    ts = F.lit("2024-03-01 00:00:00").cast("timestamp")
    assert _one(spark, PF.date_ceil(ts, "day")).isoformat() == "2024-03-01T00:00:00"
    assert _one(spark, PF.date_ceil(ts, "month")).isoformat() == "2024-03-01T00:00:00"


def test_months_add_clamps_month_end(spark):
    ts = F.lit("2024-01-31 12:00:00").cast("timestamp")
    assert _one(spark, PF.months_add(ts, 1)).isoformat() == "2024-02-29T12:00:00"


def test_truncate_negative_toward_zero(spark):
    assert _one(spark, PF.truncate(F.lit(-3.789), 1)) == -3.7
    assert _one(spark, PF.truncate(F.lit(3.789), 0)) == 3.0


def test_split_part_out_of_range_is_null(spark):
    assert _one(spark, PF.split_part(F.lit("a,b"), ",", 5)) is None
    assert _one(spark, PF.split_part(F.lit("a,b"), ",", -1)) == "b"


def test_split_part_empty_field_is_empty_not_null(spark):
    # Doris: a legitimately empty field returns '', only out-of-range is NULL
    assert _one(spark, PF.split_part(F.lit("a,,b"), ",", 2)) == ""
    assert _one(spark, PF.split_part(F.lit("a,,b"), ",", 4)) is None
    assert _one(spark, PF.split_part(F.lit("a,,b"), ",", -2)) == ""
    assert _one(spark, PF.split_part(F.lit("a,,b"), ",", -3)) == "a"
    assert _one(spark, PF.split_part(F.lit("a,,b"), ",", -4)) is None


def test_split_by_string_literal_delimiter(spark):
    # a regex metachar delimiter must be treated literally
    assert _one(spark, PF.split_by_string(F.lit("a.b.c"), ".")) == ["a", "b", "c"]


def test_json_length_object_array_scalar(spark):
    assert _one(spark, PF.json_length(F.lit('{"a":1,"b":2}'))) == 2
    assert _one(spark, PF.json_length(F.lit('{"a":[1,2,3]}'), "$.a")) == 3
    assert _one(spark, PF.json_length(F.lit('{"a":5}'), "$.a")) == 1
    assert _one(spark, PF.json_length(F.lit('{"a":5}'), "$.zz")) is None


def test_money_format(spark):
    assert _one(spark, PF.money_format(F.lit(1234567.891))) == "1,234,567.89"


def test_ip_roundtrip_edges(spark):
    for ip in ["0.0.0.0", "255.255.255.255", "10.0.0.1"]:
        num = _one(spark, PF.inet_aton(F.lit(ip)))
        assert _one(spark, PF.inet_ntoa(F.lit(num))) == ip


def test_array_helpers(spark):
    arr = F.array(*[F.lit(x) for x in [3, 1, 2]])
    assert _one(spark, PF.array_cum_sum(arr)) == [3.0, 4.0, 6.0]
    assert _one(spark, PF.array_difference(arr)) == [0.0, -2.0, 1.0]
    assert _one(spark, PF.array_popback(arr)) == [3, 1]
    assert _one(spark, PF.array_popfront(arr)) == [1, 2]
    assert _one(spark, PF.array_range(1, 10, 3)) == [1, 4, 7]
    assert _one(spark, PF.array_range(3)) == [0, 1, 2]
    assert _one(spark, PF.array_enumerate(arr)) == [1, 2, 3]
    assert _one(spark, PF.array_with_constant(3, "x")) == ["x", "x", "x"]
    assert _one(
        spark,
        PF.array_sortby(
            F.array(F.lit("a"), F.lit("b")), F.array(F.lit(2), F.lit(1))
        ),
    ) == ["b", "a"]


def test_field_elt_find_in_set(spark):
    assert _one(spark, PF.field(F.lit("b"), "a", "b", "c")) == 2
    assert _one(spark, PF.field(F.lit("zz"), "a", "b")) == 0
    assert _one(spark, PF.elt(F.lit(1), "x", "y")) == "x"
    assert _one(spark, PF.find_in_set(F.lit("c"), "a,b,c")) == 3
    assert _one(spark, PF.find_in_set(F.lit("z"), "a,b,c")) == 0


def test_sum0_semantics_via_ifnull(spark):
    # SUM over empty group is NULL; Doris SUM0 yields 0
    empty = spark.range(0)
    row = empty.agg(F.coalesce(F.sum("id"), F.lit(0)).alias("s")).collect()[0]
    assert row["s"] == 0


def test_url_and_mask_functions(spark):
    from palo_spark.functions import (
        format_round,
        mask,
        mask_first_n,
        mask_last_n,
        parse_url,
        url_decode,
        url_encode,
    )
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(u="https://doris.apache.org/docs/install?lang=en&v=2", s="Ab3-Zx9")]
    )
    r = df.select(
        parse_url("u", "HOST").alias("host"),
        parse_url("u", "PATH").alias("path"),
        parse_url("u", "QUERY", "lang").alias("lang"),
        url_encode(F.lit("a b&c")).alias("enc"),
        url_decode(F.lit("a+b%26c")).alias("dec"),
        format_round(F.lit(1234567.891), 2).alias("fmt"),
        mask("s").alias("m"),
        mask_first_n("s", 3).alias("mf"),
        mask_last_n("s", 3).alias("ml"),
    ).head()
    assert r["host"] == "doris.apache.org" and r["path"] == "/docs/install"
    assert r["lang"] == "en"
    assert r["enc"] == "a+b%26c" and r["dec"] == "a b&c"
    assert r["fmt"] == "1,234,567.89"
    assert r["m"] == "Xxn-Xxn"
    assert r["mf"] == "Xxn-Zx9"
    assert r["ml"] == "Ab3-Xxn"


def test_json_mutation_family(spark):
    """json_insert adds absent leaves only; json_replace present only;
    json_set both; intermediate paths are never created; invalid JSON
    -> NULL (Doris/MySQL semantics)."""
    from palo_spark import functions as PF

    docs = [
        ('{"a": 1, "b": {"c": 2}, "arr": [1, 2]}',),
        ("not json",),
        (None,),
    ]
    df = spark.createDataFrame(docs, ["j"])
    out = df.select(
        PF.json_insert("j", "$.x", 9, "$.a", 99).alias("ins"),
        PF.json_replace("j", "$.a", 5, "$.missing", 1).alias("rep"),
        PF.json_set("j", "$.b.c", 7, "$.arr[5]", 3, "$.p.q", 1).alias("st"),
    ).collect()
    import json as J

    ins, rep, st = out[0]["ins"], out[0]["rep"], out[0]["st"]
    assert J.loads(ins) == {"a": 1, "b": {"c": 2}, "arr": [1, 2], "x": 9}
    assert J.loads(rep) == {"a": 5, "b": {"c": 2}, "arr": [1, 2]}
    # set: replaces b.c, appends out-of-range arr index, skips missing
    # intermediate path $.p.q
    assert J.loads(st) == {"a": 1, "b": {"c": 7}, "arr": [1, 2, 3]}
    assert out[1]["ins"] is None and out[2]["st"] is None


def test_time_round_family(spark):
    """15-minute floor/ceil from epoch origin; boundary ts is its own
    floor AND ceil; 3-month buckets are calendar-exact."""
    from palo_spark import functions as PF

    rows = [
        ("2024-03-01 10:07:30",),
        ("2024-03-01 10:15:00",),   # exactly on a boundary
        ("2024-03-31 23:59:59",),
    ]
    df = spark.createDataFrame(rows, ["s"]).select(
        F.col("s").cast("timestamp").alias("ts")
    )
    got = df.select(
        F.date_format(PF.time_floor("ts", 15, "minute"), "yyyy-MM-dd HH:mm:ss").alias("fl"),
        F.date_format(PF.time_ceil("ts", 15, "minute"), "yyyy-MM-dd HH:mm:ss").alias("ce"),
        F.date_format(PF.time_floor("ts", 3, "month"), "yyyy-MM-dd HH:mm:ss").alias("mo"),
    ).collect()
    assert [r["fl"] for r in got] == [
        "2024-03-01 10:00:00", "2024-03-01 10:15:00", "2024-03-31 23:45:00"]
    assert [r["ce"] for r in got] == [
        "2024-03-01 10:15:00", "2024-03-01 10:15:00", "2024-04-01 00:00:00"]
    assert [r["mo"] for r in got] == [
        "2024-01-01 00:00:00", "2024-01-01 00:00:00", "2024-01-01 00:00:00"]


def test_misc_generator_wrappers(spark):
    """CHAR/SPACE/UUID/EXPLODE_NUMBERS/ARRAY_SHUFFLE wrappers."""
    from palo_spark import functions as PF

    r = spark.range(1).select(
        PF.char(F.lit(72), F.lit(105)).alias("hi"),
        PF.space(3).alias("sp"),
        PF.explode_numbers(F.lit(4)).alias("n"),
    ).collect()
    assert [x["hi"] for x in r] == ["Hi"] * 4
    assert r[0]["sp"] == "   "
    assert [x["n"] for x in r] == [0, 1, 2, 3]
    u = spark.range(2).select(PF.uuid().alias("u")).collect()
    assert len({x["u"] for x in u}) == 2 and len(u[0]["u"]) == 36
    sh = (
        spark.createDataFrame([([1, 2, 3, 4],)], ["a"])
        .select(PF.array_shuffle("a", seed=1).alias("s"))
        .first()["s"]
    )
    assert sorted(sh) == [1, 2, 3, 4]


def test_yearweek_iso_boundaries(spark):
    from palo_spark.functions import yearweek

    df = spark.createDataFrame(
        [("2025-12-29",), ("2027-01-01",), ("2024-06-15",)], ["s"]
    ).select(yearweek(F.col("s").cast("date")).alias("yw"))
    assert [r["yw"] for r in df.collect()] == [202601, 202653, 202424]


def test_scalar_batch4_kernels(spark):
    """Pin the batch-4 wrappers that have no DuckDB-oracle coverage:
    hyperbolics, QUOTE escaping, RUNNING_DIFFERENCE, CHR, E/PI,
    milliseconds_sub and microseconds roundtrip, soundex/sha1."""
    import math

    from palo_spark import functions as PF

    r = spark.range(1).select(
        PF.sinh(F.lit(1.0)).alias("sh"),
        PF.cosh(F.lit(1.0)).alias("ch"),
        PF.tanh(F.lit(1.0)).alias("th"),
        PF.asinh(F.lit(1.0)).alias("ash"),
        PF.acosh(F.lit(2.0)).alias("ach"),
        PF.atanh(F.lit(0.5)).alias("ath"),
        PF.e().alias("e"),
        PF.pi().alias("pi"),
        PF.chr_char(F.lit(65)).alias("a"),
        PF.quote(F.lit("it's a \\ test")).alias("q"),
        PF.quote(F.lit(None).cast("string")).alias("qn"),
        PF.soundex(F.lit("Robert")).alias("sx"),
        PF.sha1(F.lit("abc").cast("binary")).alias("s1"),
        PF.milliseconds_sub(
            PF.milliseconds_add(F.lit("2024-01-01 00:00:00").cast("timestamp"), 250),
            250,
        ).alias("ms_rt"),
        PF.microseconds_diff(
            PF.microseconds_add(F.lit("2024-01-01 00:00:00").cast("timestamp"), 77),
            F.lit("2024-01-01 00:00:00").cast("timestamp"),
        ).alias("us"),
    ).first()
    assert abs(r["sh"] - math.sinh(1.0)) < 1e-12
    assert abs(r["ch"] - math.cosh(1.0)) < 1e-12
    assert abs(r["th"] - math.tanh(1.0)) < 1e-12
    assert abs(r["ash"] - math.asinh(1.0)) < 1e-12
    assert abs(r["ach"] - math.acosh(2.0)) < 1e-12
    assert abs(r["ath"] - math.atanh(0.5)) < 1e-12
    assert r["e"] == math.e and r["pi"] == math.pi
    assert r["a"] == "A"
    assert r["q"] == r"'it\'s a \\ test'"
    assert r["qn"] == "NULL"
    assert r["sx"] == "R163"
    assert r["s1"] == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert str(r["ms_rt"]) == "2024-01-01 00:00:00"
    assert r["us"] == 77


def test_running_difference(spark):
    """RUNNING_DIFFERENCE: first row per partition is 0; others are the
    gap to the previous row in the named order."""
    from palo_spark.functions import running_difference

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 13.0), ("a", 3, 11.5), ("b", 1, 5.0), ("b", 2, 2.0)],
        ["g", "i", "v"],
    ).select(
        "g", "i",
        running_difference("v", partition_by="g", order_by="i").alias("d"),
    )
    got = {(r["g"], r["i"]): r["d"] for r in df.collect()}
    assert got == {("a", 1): 0.0, ("a", 2): 3.0, ("a", 3): -1.5,
                   ("b", 1): 0.0, ("b", 2): -3.0}
    # the global (no partition_by) form plans a single-partition sort —
    # explicit opt-in only (VERDICT r6 "what's wrong" #3)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="single-partition"):
        running_difference("v", order_by="i")
    base = spark.createDataFrame([(1, 10.0), (2, 13.0)], ["i", "v"])
    rows = base.select(
        "i", running_difference("v", order_by="i", allow_global=True).alias("d")
    ).collect()
    assert {r["i"]: r["d"] for r in rows} == {1: 0.0, 2: 3.0}


def test_scalar_r7_batch(spark):
    """r7 scalar batch: sub_replace positional semantics (0-based
    start, default len = length(new), edges at both ends),
    compress/uncompress MySQL framing (4-byte LE length + zlib;
    empty → empty, malformed → NULL), uuid_numeric positivity."""
    from palo_spark.functions import (
        compress,
        sub_replace,
        uncompress,
        uuid_numeric,
    )

    df = spark.createDataFrame(
        [("hello world",), ("",), (None,)], "s string"
    )
    rows = df.select(
        sub_replace("s", "XY", 2, 3).alias("mid"),
        sub_replace("s", "Q", 0).alias("head"),
        uncompress(compress("s")).alias("rt"),
    ).collect()
    assert [(r["mid"], r["head"], r["rt"]) for r in rows] == [
        ("heXY world", "Qello world", "hello world"),
        ("XY", "Q", ""),
        (None, None, None),
    ]
    # framing: first 4 bytes are the little-endian uncompressed length
    import struct

    blob = (
        spark.createDataFrame([("abcdef",)], "s string")
        .select(compress("s").alias("b"))
        .head()["b"]
    )
    assert struct.unpack("<I", bytes(blob[:4]))[0] == 6
    # malformed input → NULL (MySQL contract)
    bad = (
        spark.createDataFrame([(bytearray(b"\x06\x00\x00\x00junk"),)], "b binary")
        .select(uncompress("b").alias("u"))
        .head()["u"]
    )
    assert bad is None
    assert all(
        r["u"] >= 0
        for r in spark.range(50).select(uuid_numeric().alias("u")).collect()
    )
    # SQL-text route: Doris SUB_REPLACE through the frontend
    from palo_spark.sql_frontend import doris_sql

    spark.createDataFrame([("hello world",)], "s string").createOrReplaceTempView(
        "srv"
    )
    r = doris_sql(
        spark, "SELECT sub_replace(s, 'XY', 2, 3) AS a FROM srv"
    ).head()
    assert r["a"] == "heXY world"


def test_scalar_batch5_edges(spark):
    """Batch-5 edges not exercised by the oracle entry: ngram_search
    full/zero containment, CIDR /32 and /0, months_between fraction,
    version() smoke."""
    from pyspark.sql import functions as F

    from palo_spark import functions as PF

    df = spark.createDataFrame(
        [("the united states", "10.8.0.1"), ("zzz", "11.0.0.1")], ["t", "ip"]
    )
    r = df.select(
        PF.ngram_search("t", "united", n=3).alias("ngs"),
        PF.is_ip_address_in_range("ip", "10.8.0.0/13").alias("in13"),
        PF.is_ip_address_in_range("ip", "10.8.0.1/32").alias("in32"),
        PF.is_ip_address_in_range("ip", "0.0.0.0/0").alias("in0"),
        PF.months_between(F.lit("2024-03-15"), F.lit("2024-01-15")).alias("mb"),
        PF.version().alias("v"),
    ).collect()
    assert r[0]["ngs"] == 1.0 and r[1]["ngs"] == 0.0
    assert r[0]["in13"] is True and r[1]["in13"] is False
    assert r[0]["in32"] is True and r[1]["in32"] is False
    assert r[0]["in0"] is True and r[1]["in0"] is True
    assert r[0]["mb"] == 2.0
    assert r[0]["v"].startswith("4.")


def test_topn_array_exact_frequencies(spark):
    from pyspark.sql import functions as F

    from palo_spark import functions as PF

    df = spark.createDataFrame(
        [(1, v) for v in ["a", "b", "a", "c", "a", "b", "d"]], ["g", "v"]
    )
    r = df.groupBy("g").agg(PF.topn_array("v", 2).alias("top")).collect()[0]
    assert r["top"] == ["a", "b"]  # a x3, b x2


def test_months_years_diff_month_end_semantics(spark):
    """MySQL TIMESTAMPDIFF complete-unit semantics at month-end
    boundaries — java.time would clamp Jan 31 -> Feb 28 to 1 month."""
    import palo_spark.functions as pf
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,)], "i int")

    def val(col):
        return df.select(col.alias("v")).collect()[0]["v"]

    ts = lambda s: F.lit(s).cast("timestamp")
    assert val(pf.months_diff(ts("2020-02-28"), ts("2020-01-31"))) == 0
    assert val(pf.months_diff(ts("2020-02-29"), ts("2020-01-31"))) == 0
    assert val(pf.months_diff(ts("2020-03-01"), ts("2020-01-31"))) == 1
    assert val(pf.months_diff(ts("2020-03-31"), ts("2020-01-31"))) == 2
    # symmetric for negative spans
    assert val(pf.months_diff(ts("2020-01-31"), ts("2020-02-28"))) == 0
    assert val(pf.months_diff(ts("2020-01-31"), ts("2020-03-31"))) == -2
    # time-of-day participates in the boundary
    assert val(pf.months_diff(ts("2020-02-15 09:59:59"), ts("2020-01-15 10:00:00"))) == 0
    assert val(pf.months_diff(ts("2020-02-15 10:00:00"), ts("2020-01-15 10:00:00"))) == 1
    assert val(pf.years_diff(ts("2021-01-30"), ts("2020-01-31"))) == 0
    assert val(pf.years_diff(ts("2021-01-31"), ts("2020-01-31"))) == 1
    assert val(pf.timestampdiff("quarter", ts("2020-01-31"), ts("2020-04-29"))) == 0
    assert val(pf.timestampdiff("quarter", ts("2020-01-31"), ts("2020-05-01"))) == 1


def test_sm3_known_vectors(spark):
    """GB/T 32905-2016 standard test vectors, through the Spark column."""
    import palo_spark.functions as pf
    from palo_spark.functions import _sm3_digest

    assert _sm3_digest(b"abc") == (
        "66c7f0f462eeedd9d1f2d46bdc10e4e24167c4875cf2f7a2297da02b8f4ba8e0"
    )
    assert _sm3_digest(b"abcd" * 16) == (
        "debe9ff92275b8a138604889c18e5a4d6fdb70e5387e5765293dcba39c0c5732"
    )
    df = spark.createDataFrame([("abc",), (None,)], "s string")
    got = [r["h"] for r in df.select(pf.sm3("s").alias("h")).collect()]
    assert got[0] == "66c7f0f462eeedd9d1f2d46bdc10e4e24167c4875cf2f7a2297da02b8f4ba8e0"
    assert got[1] is None
    # sm3sum concatenates like md5sum
    two = spark.createDataFrame([("ab", "c")], "a string, b string")
    assert two.select(pf.sm3sum("a", "b").alias("h")).collect()[0]["h"] == got[0]


def test_date_format_computed_specifiers(spark):
    """%w / %D / %v / %x compose expression pieces with formatter runs;
    ISO week-year boundaries (Jan 1 in the old ISO year) are the
    canonical trap."""
    import palo_spark.functions as pf
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2020-01-01",), ("2021-01-01",), ("2023-01-02",), ("2020-12-31",),
         ("2020-03-22",), ("2020-03-13",)],
        "d string",
    )
    out = df.select(
        "d",
        pf.date_format(F.col("d").cast("timestamp"), "%w").alias("w"),
        pf.date_format(F.col("d").cast("timestamp"), "%D of %M").alias("dd"),
        pf.date_format(F.col("d").cast("timestamp"), "%x-W%v").alias("isow"),
    )
    got = {r["d"]: (r["w"], r["dd"], r["isow"]) for r in out.collect()}
    assert got["2020-01-01"] == ("3", "1st of January", "2020-W01")
    assert got["2021-01-01"] == ("5", "1st of January", "2020-W53")  # ISO year 2020!
    assert got["2023-01-02"] == ("1", "2nd of January", "2023-W01")
    assert got["2020-12-31"] == ("4", "31st of December", "2020-W53")
    assert got["2020-03-22"][1] == "22nd of March"
    assert got["2020-03-13"][1] == "13th of March"


def test_sql_frontend_computed_date_format():
    from palo_spark.sql_frontend import translate

    out = translate("SELECT date_format(d, '%x-W%v') FROM t")
    assert "CONCAT(" in out and "weekofyear" in out
    # pure patterns keep the single-call fast path
    assert "CONCAT" not in translate("SELECT date_format(d, '%Y-%m')")


def test_sm4_standard_vector_and_roundtrip(spark):
    """GB/T 32907-2016 Appendix A single-block vector + Spark-side
    encrypt/decrypt round-trip in both modes, NULL passthrough."""
    from palo_spark.functions.sm4 import (
        _crypt_blocks,
        _from_lanes,
        _to_lanes,
        sm4_key_schedule,
    )
    import palo_spark.functions as pf
    from pyspark.sql import functions as F

    key = bytes.fromhex("0123456789abcdeffedcba9876543210")
    pt = bytes.fromhex("0123456789abcdeffedcba9876543210")
    ct = _from_lanes(_crypt_blocks(_to_lanes(pt), sm4_key_schedule(key)))
    assert ct.hex() == "681edf34d206965e86b3e94f536e4246"

    df = spark.createDataFrame(
        [("short",), ("exactly-16-bytes",), ("a much longer payload spanning blocks",), (None,)],
        "s string",
    )
    k = "0123456789abcdef"
    out = df.select(
        "s",
        pf.sm4_decrypt(pf.sm4_encrypt("s", k), k).alias("ecb_rt"),
        pf.sm4_decrypt(
            pf.sm4_encrypt("s", k, "fedcba9876543210", "SM4_128_CBC"),
            k,
            "fedcba9876543210",
            "SM4_128_CBC",
        ).alias("cbc_rt"),
        F.length(pf.sm4_encrypt("s", k)).alias("clen"),
    ).collect()
    for r in out:
        assert r["ecb_rt"] == r["s"] and r["cbc_rt"] == r["s"]
        if r["s"] is not None:
            assert r["clen"] == (len(r["s"]) // 16 + 1) * 16
        else:
            assert r["clen"] is None


def test_sm4_decrypt_garbage_is_null(spark):
    import palo_spark.functions as pf
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(b"not-a-block",), (b"0123456789abcdef",)], "b binary")
    out = df.select(pf.sm4_decrypt(F.col("b"), "0123456789abcdef").alias("d")).collect()
    # misaligned -> NULL; aligned random block -> decrypts to junk or NULL
    assert out[0]["d"] is None


def test_native_skew_kurt_match_two_pass(spark):
    """functions.skew/kurt (Spark's single-pass population moments)
    agree with the textbook two-pass formula to float tolerance on
    non-degenerate groups — the suite's parity entry computes the
    two-pass form exactly; this pins the native path against it."""
    import math
    import random

    import palo_spark.functions as pf
    from pyspark.sql import functions as F

    random.seed(11)
    rows = [(i % 3, random.gauss(50, 12) + (i % 3) * 5) for i in range(600)]
    df = spark.createDataFrame(rows, "k int, v double")
    got = {
        r["k"]: (r["s"], r["ku"])
        for r in df.groupBy("k")
        .agg(pf.skew("v").alias("s"), pf.kurt("v").alias("ku"))
        .collect()
    }
    by_k = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    for k, vs in by_k.items():
        m = sum(vs) / len(vs)
        m2 = sum((x - m) ** 2 for x in vs) / len(vs)
        m3 = sum((x - m) ** 3 for x in vs) / len(vs)
        m4 = sum((x - m) ** 4 for x in vs) / len(vs)
        assert math.isclose(got[k][0], m3 / m2**1.5, rel_tol=1e-6, abs_tol=1e-9)
        assert math.isclose(got[k][1], m4 / m2**2 - 3, rel_tol=1e-6, abs_tol=1e-9)


def test_mysql_week_modes_match_python(spark):
    """%U/%u/%V/%X (MySQL week modes 0/1/2) against an INDEPENDENT
    oracle: %U via C strftime, %u via isocalendar (mode-1 = ISO weeks
    renumbered within the calendar year), %V/%X via the previous-year
    fallback of %U — across several year boundaries including
    Sunday/Monday/Friday January 1sts."""
    import datetime as dt

    from palo_spark.functions import date_format
    from palo_spark.sql_frontend import doris_sql

    days = [dt.date(1995, 1, 1) + dt.timedelta(days=i * 13) for i in range(290)]
    days += [dt.date(y, m, d)
             for y in (1996, 1999, 2016, 2017, 2019, 2020, 2021)
             for (m, d) in ((1, 1), (1, 2), (1, 7), (12, 28), (12, 30), (12, 31))]

    def exp_U(d):
        return d.strftime("%U")

    def exp_u(d):
        iso_y, iso_w, _ = d.isocalendar()
        if iso_y < d.year:
            return "00"
        if iso_y == d.year:
            return f"{iso_w:02d}"
        return f"{dt.date(d.year, 12, 28).isocalendar()[1] + 1:02d}"

    def exp_V(d):
        u = int(d.strftime("%U"))
        if u >= 1:
            return f"{u:02d}"
        return f"{int(dt.date(d.year - 1, 12, 31).strftime('%U')):02d}"

    def exp_X(d):
        return str(d.year if int(d.strftime("%U")) >= 1 else d.year - 1)

    df = spark.createDataFrame([(d.isoformat(),) for d in days], "ds string")
    got = df.select(
        "ds",
        date_format(F.to_date("ds"), "%U").alias("U"),
        date_format(F.to_date("ds"), "%u").alias("u"),
        date_format(F.to_date("ds"), "%V").alias("V"),
        date_format(F.to_date("ds"), "%X").alias("X"),
    ).collect()
    for r in got:
        d = dt.date.fromisoformat(r["ds"])
        assert r["U"] == exp_U(d), ("U", d, r["U"])
        assert r["u"] == exp_u(d), ("u", d, r["u"])
        assert r["V"] == exp_V(d), ("V", d, r["V"])
        assert r["X"] == exp_X(d), ("X", d, r["X"])
    # SQL-text path agrees with the Column path
    df.createOrReplaceTempView("wk_days")
    rows = doris_sql(
        spark,
        "SELECT ds, date_format(CAST(ds AS DATE), '%X-%V|%U|%u') AS s "
        "FROM wk_days",
    ).collect()
    for r in rows:
        d = dt.date.fromisoformat(r["ds"])
        assert r["s"] == f"{exp_X(d)}-{exp_V(d)}|{exp_U(d)}|{exp_u(d)}", d


def test_doris_hash_udfs_sql_surface(spark):
    """murmur_hash3_32 (Doris seed 104729 — ADVICE r10: seed 0
    diverges from every real deployment), murmur_hash3_64 (Doris's
    single-lane x64 variant, seed 0), xxhash_64 (seed 0; Spark's
    natives fix seed 42) and sm3 at the SQL surface. The murmur kernel
    is cross-verified against Spark's native hash() at seed 42 on
    4-byte-aligned inputs (Spark's tail handling deviates from the
    standard on unaligned lengths — a documented Spark quirk) plus the
    published Appleby reference vector AND the Doris doc vectors,
    including the multi-arg chained forms."""
    import random

    from pyspark.sql import functions as F

    from palo_spark.functions import (
        _MURMUR3_32_SEED,
        _murmur3_32,
        _murmur3_64,
        register_doris_hash_udfs,
    )
    from palo_spark.operators.text_index import xxhash64_str

    assert _murmur3_32(b"hello", 0) == 0x248BFA47  # Appleby reference vector
    assert _murmur3_32(b"", 0) == 0
    # Doris doc vectors ([docs: hash-functions]) — the seeds that match
    # what a real deployment persisted:
    assert _MURMUR3_32_SEED == 104729
    assert _murmur3_32(b"hello", _MURMUR3_32_SEED) == 1321743225
    h = _MURMUR3_32_SEED
    for s in (b"hello", b"world"):
        h = _murmur3_32(s, h & 0xFFFFFFFF)
    assert h == 984713481  # murmur_hash3_32('hello','world')
    assert _murmur3_64(b"hello", 0) == -3215607508166160593
    h = 0
    for s in (b"hello", b"world"):
        h = _murmur3_64(s, h & ((1 << 64) - 1))
    assert h == 3583109472027628045  # murmur_hash3_64('hello','world')
    # xxhash_64 doc vector: seed-0 XXH64('hello')
    assert xxhash64_str("hello", 0) == 2794345569481354659
    rng = random.Random(11)
    strings = [
        "".join(rng.choice("abcdef 123XYZ") for _ in range(4 * rng.randint(0, 8)))
        for _ in range(30)
    ]
    rows = spark.createDataFrame([(s,) for s in strings], "s string").select(
        "s", F.hash("s").alias("h32"), F.xxhash64("s").alias("h64")
    ).collect()
    for r in rows:
        assert _murmur3_32(r["s"].encode(), 42) == r["h32"], r["s"]
        assert xxhash64_str(r["s"], 42) == r["h64"], r["s"]
    register_doris_hash_udfs(spark)
    got = spark.sql(
        "SELECT murmur_hash3_32('hello') AS m, murmur_hash3_64('hello') "
        "AS m64, xxhash_64('hello') AS x, sm3('abc') AS s, "
        "murmur_hash3_32(NULL) AS mn"
    ).collect()[0]
    assert got["m"] == 1321743225
    assert got["m64"] == -3215607508166160593
    assert got["x"] == xxhash64_str("hello", 0)
    assert got["s"] == (
        "66c7f0f462eeedd9d1f2d46bdc10e4e24167c4875cf2f7a2297da02b8f4ba8e0"
    )
    assert got["mn"] is None
    # Column API: multi-arg chained forms + NULL propagation
    import palo_spark.functions as PF

    row = (
        spark.createDataFrame([("hello", "world", None)], "a string, b string, c string")
        .select(
            PF.murmur_hash3_32("a", "b").alias("m2"),
            PF.murmur_hash3_64("a", "b").alias("m642"),
            PF.murmur_hash3_32("a", "c").alias("mnull"),
        )
        .collect()[0]
    )
    assert row["m2"] == 984713481
    assert row["m642"] == 3583109472027628045
    assert row["mnull"] is None
    # SQL surface is variadic like upstream (ADVICE r11) — same doc
    # vectors as the Column API, NULL in any arg → NULL
    got = spark.sql(
        "SELECT murmur_hash3_32('hello', 'world') AS m2, "
        "murmur_hash3_64('hello', 'world') AS m642, "
        "xxhash_64('hello', 'world') AS x2, "
        "murmur_hash3_32('hello', NULL) AS mn2"
    ).collect()[0]
    assert got["m2"] == 984713481
    assert got["m642"] == 3583109472027628045
    assert got["x2"] == xxhash64_str(
        "world", xxhash64_str("hello", 0) & 0xFFFFFFFFFFFFFFFF
    )
    assert got["mn2"] is None
