"""Doris TABLESAMPLE ([docs: SELECT]) — deterministic hash-of-key
adaptation of upstream's tablet sampling (see
PaloSession._rewrite_tablesample for the contract)."""

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture
def ps(spark, tmp_path):
    s = PaloSession(spark, location_root=str(tmp_path))
    s.sql(
        "CREATE TABLE ts (`k` BIGINT, `v` VARCHAR(8)) DUPLICATE KEY(k) "
        "DISTRIBUTED BY HASH(k) BUCKETS 4"
    )
    s.sql(
        "INSERT INTO ts VALUES "
        + ", ".join(f"({i}, 'v{i}')" for i in range(500))
    )
    return s


def test_percent_matches_sample_hash_operator(ps, spark):
    from palo_spark.operators.sampling import sample_hash

    got = sorted(
        r[0]
        for r in ps.sql(
            "SELECT k FROM ts TABLESAMPLE (30 PERCENT) REPEATABLE (7)"
        ).collect()
    )
    want = sorted(
        r[0]
        for r in sample_hash(
            spark.table("ts"), "k", 0.3, seed=7, mode="minstd"
        ).collect()
    )
    assert got == want and 0 < len(got) < 500
    # deterministic: the same statement selects the same rows
    again = sorted(
        r[0]
        for r in ps.sql(
            "SELECT k FROM ts TABLESAMPLE (30 PERCENT) REPEATABLE (7)"
        ).collect()
    )
    assert again == got


def test_rows_form_is_fraction_of_count(ps):
    got = ps.sql("SELECT k FROM ts TABLESAMPLE (100 ROWS)").collect()
    # approximate by contract (hash fraction, not LIMIT): within 3x band
    assert 30 <= len(got) <= 300
    all_rows = ps.sql("SELECT k FROM ts TABLESAMPLE (5000 ROWS)").collect()
    assert len(all_rows) == 500  # fraction clamps at 1.0


def test_alias_and_joins_compose(ps):
    n = ps.sql(
        "SELECT COUNT(*) AS n FROM ts t1 TABLESAMPLE (20 PERCENT) "
        "JOIN ts t2 ON t1.k = t2.k"
    ).collect()[0][0]
    assert 0 < n < 500


def test_requires_session_table(ps, spark):
    spark.range(10).createOrReplaceTempView("plainview")
    with pytest.raises(ValueError, match="OLAP"):
        ps.sql("SELECT * FROM plainview TABLESAMPLE (10 PERCENT)")


def test_string_key_still_deterministic(ps):
    ps.sql(
        "CREATE TABLE tss (`name` VARCHAR(12), `v` INT) DUPLICATE "
        "KEY(name) DISTRIBUTED BY HASH(name) BUCKETS 4"
    )
    ps.sql(
        "INSERT INTO tss VALUES "
        + ", ".join(f"('n{i}', {i})" for i in range(300))
    )
    a = sorted(
        r[0]
        for r in ps.sql(
            "SELECT name FROM tss TABLESAMPLE (25 PERCENT)"
        ).collect()
    )
    b = sorted(
        r[0]
        for r in ps.sql(
            "SELECT name FROM tss TABLESAMPLE (25 PERCENT)"
        ).collect()
    )
    assert a == b and 0 < len(a) < 300
