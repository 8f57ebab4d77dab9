"""NGRAM_BF / BITMAP value indexes: posting-bucket pruning for LIKE
'%needle%' and equality predicates ([docs: ngram-bloomfilter-index,
bloomfilter, bitmap-index]). The rewrite is prune -> verify: the index
only ADDS an id-IN conjunct, so every pin here asserts byte-identical
results with the full-scan path alongside the route observability."""

import glob

import pytest
from pyspark.sql import functions as F

from palo_spark.palo_session import PaloSession


@pytest.fixture
def ps(spark, tmp_path):
    return PaloSession(spark, location_root=str(tmp_path))


def _mk_docs(ps, n=300):
    ps.sql(
        "CREATE TABLE gdocs (`doc_id` BIGINT, `text` VARCHAR(200), "
        "`lang` VARCHAR(8)) DUPLICATE KEY(doc_id) "
        "DISTRIBUTED BY HASH(doc_id) BUCKETS 4"
    )
    rows = ", ".join(
        f"({i}, 'alpha tok{i % 23} needlehay{i % 7} omega', "
        f"'{'en' if i % 3 else 'de'}')"
        for i in range(n)
    )
    ps.sql(f"INSERT INTO gdocs VALUES {rows}")


def test_ngram_like_route_matches_full_scan(ps):
    _mk_docs(ps)
    q = "SELECT doc_id FROM gdocs WHERE `text` LIKE '%needlehay3%' ORDER BY doc_id"
    full = [r[0] for r in ps.sql(q).collect()]
    assert not ps.last_like_indexed and full  # no index yet -> full scan
    ps.sql(
        "CREATE INDEX g_ng ON gdocs (text) USING NGRAM_BF "
        "PROPERTIES('gram_size'='3', 'bf_size'='256')"
    )
    got = [r[0] for r in ps.sql(q).collect()]
    assert ps.last_like_indexed
    assert got == full


def test_ngram_index_follows_mutations(ps):
    _mk_docs(ps, n=60)
    ps.sql("CREATE INDEX g_ng ON gdocs (text) USING NGRAM_BF")
    q = "SELECT doc_id FROM gdocs WHERE `text` LIKE '%XYZZY%' ORDER BY doc_id"
    assert ps.sql(q).collect() == []
    ps.sql("INSERT INTO gdocs VALUES (9001, 'pre XYZZY post', 'en')")
    got = [r[0] for r in ps.sql(q).collect()]
    assert ps.last_like_indexed and got == [9001]
    # DELETE invalidates too (mutation token moves)
    ps.sql("DELETE FROM gdocs WHERE doc_id = 9001")
    assert ps.sql(q).collect() == [] and ps.last_like_indexed


def test_ngram_route_refusals_fall_through(ps):
    """Every non-conforming shape runs the full scan with identical
    results — the index can only accelerate, never change semantics."""
    _mk_docs(ps, n=90)
    ps.sql("CREATE INDEX g_ng ON gdocs (text) USING NGRAM_BF")
    shapes = [
        "SELECT doc_id FROM gdocs WHERE `text` LIKE '%a%b%'",  # inner wildcard
        "SELECT doc_id FROM gdocs WHERE `text` LIKE '%a_c%'",  # underscore
        "SELECT doc_id FROM gdocs WHERE `text` LIKE 'alpha%'",  # prefix form
        "SELECT doc_id FROM gdocs WHERE `text` LIKE '%x%'",  # < gram_size
        "SELECT doc_id FROM gdocs WHERE `text` NOT LIKE '%omega%'",
        # two LIKE predicates
        "SELECT doc_id FROM gdocs WHERE `text` LIKE '%tok1%' AND `text` LIKE '%omega%'",
    ]
    for s in shapes:
        ps.sql(s).collect()
        assert not ps.last_like_indexed, s
    # NOT LIKE fall-through still answers correctly
    n_not = ps.sql(
        "SELECT COUNT(*) AS n FROM gdocs WHERE `text` NOT LIKE '%omega%'"
    ).collect()[0][0]
    assert n_not == 0


def test_ngram_requires_string_column(ps):
    _mk_docs(ps, n=10)
    with pytest.raises(ValueError, match="string column"):
        ps.sql("CREATE INDEX bad ON gdocs (doc_id) USING NGRAM_BF")
    with pytest.raises(ValueError, match="gram_size"):
        ps.sql(
            "CREATE INDEX bad ON gdocs (text) USING NGRAM_BF "
            "PROPERTIES('gram_size'='1')"
        )


def test_bitmap_eq_route_matches_full_scan(ps):
    _mk_docs(ps)
    ps.sql("CREATE INDEX g_bm ON gdocs (lang) USING BITMAP")
    q = "SELECT doc_id FROM gdocs WHERE lang = 'de' ORDER BY doc_id"
    got = [r[0] for r in ps.sql(q).collect()]
    assert ps.last_eq_indexed
    full = [r[0] for r in ps.sql(
        "SELECT doc_id FROM gdocs WHERE lang IN ('de') ORDER BY doc_id"
    ).collect()]
    assert got == full and got
    # a backslash-escaped quote in the literal truncates the regex
    # match mid-string — the route must refuse, never splice inside
    # the literal (ADVICE r10); the full scan still answers correctly
    got3 = ps.sql(
        "SELECT doc_id FROM gdocs WHERE lang = 'don\\'t' ORDER BY doc_id"
    ).collect()
    assert not ps.last_eq_indexed and got3 == []


def test_bitmap_int_key_route_and_noncanonical_refusal(ps):
    ps.sql(
        "CREATE TABLE gi (`k` BIGINT, `grp` INT) DUPLICATE KEY(k) "
        "DISTRIBUTED BY HASH(k) BUCKETS 4"
    )
    ps.sql(
        "INSERT INTO gi VALUES "
        + ", ".join(f"({i}, {i % 5})" for i in range(100))
    )
    ps.sql("CREATE INDEX gi_bm ON gi (grp) USING BITMAP")
    got = [r[0] for r in ps.sql(
        "SELECT k FROM gi WHERE grp = 3 ORDER BY k"
    ).collect()]
    assert ps.last_eq_indexed and got == list(range(3, 100, 5))
    # non-canonical integer spelling would string-mismatch the posting
    # key -> the route must refuse (and the full scan still answers)
    got2 = [r[0] for r in ps.sql(
        "SELECT k FROM gi WHERE grp = 03 ORDER BY k"
    ).collect()]
    assert not ps.last_eq_indexed and got2 == got


def test_index_posting_buckets_prune_physically(ps, spark, tmp_path):
    """A LIKE probe reads only its grams' bucket partitions — measured
    via the file listing, the same pin shape as the inverted index."""
    from palo_spark.operators.text_index import (
        _TB,
        _query_buckets,
        needle_grams,
    )

    _mk_docs(ps, n=400)
    ps.sql("CREATE INDEX g_ng ON gdocs (text) USING NGRAM_BF")
    ps.sql("SELECT doc_id FROM gdocs WHERE `text` LIKE '%needlehay3%'").collect()
    (path,) = [v[2] for v in ps.indexes.values()]
    total = len(glob.glob(f"{path}/{_TB}=*/*.parquet"))
    assert total >= 20
    grams = needle_grams("needlehay3", 3)
    touched = (
        spark.read.parquet(path)
        .filter(F.col(_TB).isin(_query_buckets(spark, grams, 64)))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert touched < total / 2, (touched, total)


def test_index_lifecycle_rename_and_drop(ps):
    _mk_docs(ps, n=60)
    ps.sql("CREATE INDEX g_ng ON gdocs (text) USING NGRAM_BF")
    ps.sql("CREATE INDEX g_bm ON gdocs (lang) USING BITMAP")
    ps.sql("ALTER TABLE gdocs RENAME newdocs")
    q = "SELECT doc_id FROM newdocs WHERE `text` LIKE '%omega%' ORDER BY doc_id"
    got = ps.sql(q).collect()
    assert ps.last_like_indexed and len(got) == 60
    kinds = {r["index_type"] for r in ps.sql("SHOW INDEX FROM newdocs").collect()}
    assert kinds == {"NGRAM_BF", "BITMAP"}
    ps.sql("DROP INDEX g_ng ON newdocs")
    ps.sql(q).collect()
    assert not ps.last_like_indexed
    # dropping the indexed column kills the bitmap index with it
    ps.sql("ALTER TABLE newdocs DROP COLUMN lang")
    assert ps.sql("SHOW INDEX FROM newdocs").collect() == []


def test_bloom_filter_columns_property(ps):
    """`bloom_filter_columns` registers lazy value indexes at CREATE
    TABLE; the first equality query over one takes the posting route."""
    ps.sql(
        "CREATE TABLE bf (`k` BIGINT, `city` VARCHAR(16), `pv` BIGINT) "
        "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 4 "
        "PROPERTIES('bloom_filter_columns' = 'city', "
        "'replication_num' = '1')"
    )
    ps.sql(
        "INSERT INTO bf VALUES "
        + ", ".join(f"({i}, 'c{i % 7}', {i * 10})" for i in range(80))
    )
    got = [r[0] for r in ps.sql(
        "SELECT k FROM bf WHERE city = 'c4' ORDER BY k"
    ).collect()]
    assert ps.last_eq_indexed and got == list(range(4, 80, 7))
    # unknown / unsupported columns fail loud at CREATE
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown column"):
        ps.sql(
            "CREATE TABLE bf2 (`k` BIGINT) DUPLICATE KEY(k) "
            "DISTRIBUTED BY HASH(k) BUCKETS 2 "
            "PROPERTIES('bloom_filter_columns' = 'nope')"
        )


def test_ngram_index_follows_replace_partition(ps):
    """REPLACE PARTITION swaps rowset directories; the swap must bump
    the mutation token so the gram index rebuilds — a stale index
    would keep matching the pre-swap text (audit probe, r10c)."""
    ps.sql(
        "CREATE TABLE pdoc (`doc_id` BIGINT, `d` DATE, `text` VARCHAR(64)) "
        "DUPLICATE KEY(doc_id) "
        "PARTITION BY RANGE(d) ("
        "PARTITION p1 VALUES LESS THAN ('2024-02-01'), "
        "PARTITION p2 VALUES LESS THAN ('2024-03-01')) "
        "DISTRIBUTED BY HASH(doc_id) BUCKETS 2"
    )
    ps.sql(
        "INSERT INTO pdoc VALUES (1, '2024-01-10', 'oldword alpha'), "
        "(2, '2024-02-10', 'other beta')"
    )
    ps.sql("CREATE INDEX p_ng ON pdoc (text) USING NGRAM_BF")
    q = "SELECT doc_id FROM pdoc WHERE `text` LIKE '%oldword%' ORDER BY doc_id"
    assert [r[0] for r in ps.sql(q).collect()] == [1] and ps.last_like_indexed
    # backfill p1 through a temporary partition with rewritten text
    ps.sql(
        "ALTER TABLE pdoc ADD TEMPORARY PARTITION tp1 "
        "VALUES LESS THAN ('2024-02-01')"
    )
    ps.sql(
        "INSERT INTO pdoc TEMPORARY PARTITION (tp1) "
        "VALUES (1, '2024-01-10', 'newword alpha')"
    )
    ps.sql("ALTER TABLE pdoc REPLACE PARTITION (p1) WITH TEMPORARY PARTITION (tp1)")
    assert ps.sql(q).collect() == []  # oldword gone with the swap
    got = [r[0] for r in ps.sql(
        "SELECT doc_id FROM pdoc WHERE `text` LIKE '%newword%'"
    ).collect()]
    assert got == [1] and ps.last_like_indexed


def test_ngram_index_over_unique_merge_view(ps):
    """The gram index is built over the MERGED view: after an upsert
    the superseded row's text must stop matching, and the new text
    must match — merge-on-read soundness of the index route."""
    ps.sql(
        "CREATE TABLE udoc (`id` BIGINT, `text` VARCHAR(64)) "
        "UNIQUE KEY(id) DISTRIBUTED BY HASH(id) BUCKETS 2"
    )
    ps.sql("INSERT INTO udoc VALUES (1, 'first version cronk'), (2, 'steady')")
    ps.sql("CREATE INDEX u_ng ON udoc (text) USING NGRAM_BF")
    q = "SELECT id FROM udoc WHERE `text` LIKE '%cronk%'"
    assert [r[0] for r in ps.sql(q).collect()] == [1] and ps.last_like_indexed
    ps.sql("INSERT INTO udoc VALUES (1, 'second version blerg')")
    assert ps.sql(q).collect() == []
    got = [r[0] for r in ps.sql(
        "SELECT id FROM udoc WHERE `text` LIKE '%blerg%'"
    ).collect()]
    assert got == [1] and ps.last_like_indexed


def test_route_refuses_not_prefix_and_joins(ps):
    """r10c3 review fixes: a NOT directly before the predicate would
    bind OUTSIDE the spliced conjunct (wrong answers), and any JOIN —
    self-joins included — would leave the spliced unqualified key
    ambiguous. Both shapes must run the full scan."""
    _mk_docs(ps, n=60)
    ps.sql("CREATE INDEX g_ng ON gdocs (text) USING NGRAM_BF")
    ps.sql("CREATE INDEX g_bm ON gdocs (lang) USING BITMAP")
    got = [r[0] for r in ps.sql(
        "SELECT doc_id FROM gdocs WHERE NOT `text` LIKE '%tok1 %' ORDER BY doc_id"
    ).collect()]
    assert not ps.last_like_indexed
    full = [r[0] for r in ps.sql(
        "SELECT doc_id FROM gdocs WHERE `text` NOT LIKE '%tok1 %' ORDER BY doc_id"
    ).collect()]
    assert got == full and 0 < len(got) < 60
    got2 = [r[0] for r in ps.sql(
        "SELECT doc_id FROM gdocs WHERE NOT lang = 'de' ORDER BY doc_id"
    ).collect()]
    assert not ps.last_eq_indexed and len(got2) == 40
    # self-join: valid before the index existed, must stay valid
    n = ps.sql(
        "SELECT COUNT(*) AS n FROM gdocs a JOIN gdocs b "
        "ON a.doc_id = b.doc_id WHERE a.text LIKE '%omega%'"
    ).collect()[0][0]
    assert not ps.last_like_indexed and n == 60


def test_eq_route_escaped_quote_literal(ps):
    """A literal containing a doubled '' escape must not truncate the
    predicate span (the old regex spliced mid-literal -> parse error)."""
    ps.sql(
        "CREATE TABLE qt (`k` BIGINT, `s` VARCHAR(16)) DUPLICATE KEY(k) "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql("INSERT INTO qt VALUES (1, 'it''s'), (2, 'plain')")
    ps.sql("CREATE INDEX qt_bm ON qt (s) USING BITMAP")
    got = [r[0] for r in ps.sql(
        "SELECT k FROM qt WHERE s = 'it''s' ORDER BY k"
    ).collect()]
    assert got == [1]


def test_index_follows_in_place_restore(ps, tmp_path):
    """In-place RESTORE swaps the table for the backup-time incarnation
    (fresh lineage) — the gram index must rebuild, never serve the
    pre-restore postings (audit probe, r10c3 — no defect)."""
    ps.sql(
        "CREATE TABLE rx (`k` BIGINT, `t` VARCHAR(32)) DUPLICATE KEY(k) "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql("INSERT INTO rx VALUES (1, 'aaa needle bbb'), (2, 'plain')")
    ps.sql("CREATE INDEX rx_ng ON rx (t) USING NGRAM_BF")
    q = "SELECT k FROM rx WHERE `t` LIKE '%needle%'"
    assert [r[0] for r in ps.sql(q).collect()] == [1]
    ps.sql(f"CREATE REPOSITORY rr WITH LOCATION '{tmp_path}/repo'")
    ps.sql("BACKUP SNAPSHOT s1 TO rr ON (rx)")
    ps.sql("INSERT INTO rx VALUES (3, 'another needle')")
    assert sorted(r[0] for r in ps.sql(q).collect()) == [1, 3]
    ps.sql("RESTORE SNAPSHOT s1 FROM rr ON (rx)")
    got = sorted(r[0] for r in ps.sql(q).collect())
    assert got == [1] and ps.last_like_indexed
