"""Deterministic sampling / source-mixing coverage (training-data
pipeline extensions; no Doris analog).

All entries use the ``minstd`` hash mode — pure 64-bit-safe integer
arithmetic mirrored token-for-token in the DuckDB oracle, so the exact
row set (not just the expected count) is verified. The production
``xxhash64`` mode shares every line of code except the hash kernel,
which pytest covers statistically (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.operators.sampling import (
    mix_sources,
    o_hash_u,
    o_training_order,
    sample_hash,
    stratified_sample,
)
from palo_spark.suite.util import register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)


@q(
    "sample_hash_fraction",
    f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {o_hash_u('doc_id', 7)} < 0.3
    """,
)
def sample_hash_fraction(spark, sf_dir):
    """30% deterministic sample of documents: membership is a pure
    function of doc_id, so the SAME rows are selected regardless of
    partitioning or cluster size (df.sample cannot promise this).
    Narrow filter — pushed to the scan, zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    return sample_hash(d, "doc_id", 0.3, seed=7, mode="minstd").select(
        "doc_id", "lang", "source"
    )


@q(
    "sample_nested_subset",
    f"""
    SELECT
        CAST(COUNT(*) FILTER (WHERE {o_hash_u('doc_id', 7)} < 0.05) AS BIGINT)
            AS small_n,
        CAST(COUNT(*) FILTER (WHERE {o_hash_u('doc_id', 7)} < 0.3) AS BIGINT)
            AS big_n,
        CAST(COUNT(*) FILTER (WHERE {o_hash_u('doc_id', 7)} < 0.05
                                AND NOT {o_hash_u('doc_id', 7)} < 0.3) AS BIGINT)
            AS escaped
    FROM documents
    """,
)
def sample_nested_subset(spark, sf_dir):
    """Nested-sample consistency contract: at one seed the 5% sample is
    a strict subset of the 30% sample (escaped = 0) — what makes staged
    scaling experiments comparable."""
    d = load_table(spark, sf_dir, "documents")
    small = sample_hash(d, "doc_id", 0.05, seed=7, mode="minstd")
    big = sample_hash(d, "doc_id", 0.3, seed=7, mode="minstd")
    esc = small.join(big, "doc_id", "left_anti")
    return (
        small.agg(F.count("*").alias("small_n"))
        .crossJoin(big.agg(F.count("*").alias("big_n")))
        .crossJoin(esc.agg(F.count("*").alias("escaped")))
    )


@q(
    "sample_stratified_lang",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {o_hash_u('doc_id', 11)} <
        CASE WHEN lang = 'es' THEN 0.5 WHEN lang = 'zh' THEN 0.2 ELSE 0.05 END
    """,
)
def sample_stratified_lang(spark, sf_dir):
    """Rebalance the language distribution: per-stratum fractions in a
    single narrow filter (no shuffle, no per-stratum jobs) — the 100 TB
    form of corpus rebalancing."""
    d = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        d,
        "lang",
        {"es": 0.5, "zh": 0.2},
        "doc_id",
        default=0.05,
        seed=11,
        mode="minstd",
    ).select("doc_id", "lang")


@q(
    "mix_sources_weighted",
    f"""
    WITH s0 AS (SELECT doc_id, source FROM documents WHERE source = 'src0'),
         s1 AS (SELECT doc_id, source FROM documents WHERE source = 'src1')
    SELECT doc_id, source, e.epoch AS mix_epoch
    FROM s0, (VALUES (0), (1)) AS e(epoch)
    UNION ALL
    SELECT doc_id, source, 2 AS mix_epoch FROM s0
    WHERE {o_hash_u('doc_id', 1000003)} < 0.5
    UNION ALL
    SELECT doc_id, source, 0 AS mix_epoch FROM s1
    WHERE {o_hash_u('doc_id', 2000006)} < 0.25
    """,
)
def mix_sources_weighted(spark, sf_dir):
    """Weighted corpus mixture: src0 at weight 2.5 (two full epochs +
    deterministic half-sample), src1 at 0.25 — epoch upsampling for a
    high-quality source, downsampling for a noisy one, as one
    shuffle-free union."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    s0 = d.filter(F.col("source") == "src0")
    s1 = d.filter(F.col("source") == "src1")
    return mix_sources([(s0, 2.5), (s1, 0.25)], "doc_id", mode="minstd")


@q(
    "sample_split_assignment",
    f"""
    SELECT doc_id,
           CASE WHEN {o_hash_u('doc_id', 13)} < 0.9 THEN 'train'
                WHEN {o_hash_u('doc_id', 13)} < 0.95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sample_split_assignment(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test assignment: a pure function
    of doc_id — rows can never migrate between splits under re-sharding
    (prevents silent eval leakage). Narrow projection, zero shuffles."""
    from palo_spark.operators.sampling import assign_split

    d = load_table(spark, sf_dir, "documents")
    return assign_split(
        d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
        seed=13, mode="minstd",
    ).select("doc_id", "split")


@q(
    "sample_heavy_hitters",
    """
    SELECT CAST(l_suppkey AS VARCHAR) AS value,
           CAST(COUNT(*) AS BIGINT) AS est_count,
           CAST(0 AS BIGINT) AS max_err
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY est_count DESC, value
    LIMIT 10
    """,
)
def sample_heavy_hitters(spark, sf_dir):
    """Space-saving top-k heavy hitters (the mergeable-counter shape of
    Doris's TOPN aggregate): bounded per-partition counter maps merged
    on the driver. With capacity above the column's NDV the sketch is
    provably exact (no eviction path fires), so the oracle is a plain
    exact top-10 — genuine value parity including the zero error
    bounds; sketch-mode accuracy under eviction is pinned by pytest."""
    from palo_spark.operators.sampling import heavy_hitters

    li = load_table(spark, sf_dir, "lineitem")
    return heavy_hitters(li, "l_suppkey", k=10, capacity=4096)


@q(
    "sample_grouped_heavy_hitters",
    """
    WITH cnt AS (
        SELECT l_returnflag, CAST(l_suppkey AS VARCHAR) AS value,
               CAST(COUNT(*) AS BIGINT) AS est_count
        FROM lineitem GROUP BY l_returnflag, l_suppkey
    ),
    ranked AS (
        SELECT l_returnflag, value, est_count,
               CAST(0 AS BIGINT) AS max_err,
               CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                    ORDER BY est_count DESC, value) AS INT) AS rank
        FROM cnt
    )
    SELECT l_returnflag, value, est_count, max_err, rank
    FROM ranked WHERE rank <= 3
    """,
)
def sample_grouped_heavy_hitters(spark, sf_dir):
    """Per-group space-saving TOPN (Doris ``TOPN(col, k)`` per group):
    bounded counter map per group under applyInPandas — O(capacity)
    state per group under any skew. Capacity above the per-group NDV
    makes it provably exact, so the oracle is the plain per-group
    top-3 with the same deterministic tie-break."""
    from palo_spark.operators.sampling import grouped_heavy_hitters

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_heavy_hitters(li, "l_returnflag", "l_suppkey", k=3, capacity=4096)


@q(
    "sample_training_order",
    f"""
    WITH keyed AS (
        SELECT doc_id, {o_training_order('doc_id', 16, 7)}
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                ORDER BY __key, doc_id) AS BIGINT) AS pos
    FROM keyed
    """,
)
def sample_training_order(spark, sf_dir):
    """Deterministic global shuffle for training layout
    (`operators.sampling.training_order`): every doc gets a (shard,
    pos) address as a pure function of (doc_id, seed) — the fixed
    epoch order is reproducible on any cluster size / partitioning.
    One uniform hash shuffle + per-shard rank (window parallelizes
    across shards — never a global sort). Oracle replays the exact
    integer Lehmer keys and the per-shard ROW_NUMBER."""
    from palo_spark.operators.sampling import training_order

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return training_order(docs, "doc_id", shards=16, seed=7).select(
        "doc_id", "shard", "pos"
    )


@q(
    "sample_token_budget",
    rf"""
    WITH staged AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ntok,
               {o_hash_u('doc_id', 11)} AS pr
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, ntok,
               COALESCE(SUM(ntok) OVER (
                   PARTITION BY source ORDER BY pr, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS before
        FROM staged
    )
    SELECT doc_id, source FROM cum WHERE before < 2000
    ORDER BY source, doc_id
    """,
)
def sample_token_budget_q(spark, sf_dir):
    """Token-budget quota sampling (`sampling.sample_token_budget`):
    per source, keep documents in deterministic minstd-priority order
    until ~2000 tokens are selected (overshoot ≤ 1 doc, first doc of a
    source always kept). Partitioning-independent — the oracle replays
    the hash priority AND the cumulative-sum cutoff exactly, so the
    selected row SET is verified, not just its size. One window per
    source group; the scale contract is per-group budgets (global
    budget = single window, post-aggregation frames only)."""
    from palo_spark.operators.sampling import sample_token_budget

    d = load_table(spark, sf_dir, "documents")
    return (
        sample_token_budget(
            d, "doc_id", budget=2000, group_col="source", seed=11, mode="minstd"
        )
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


@q(
    "sample_temperature_mix",
    f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n,
               CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
        FROM counts
    ),
    t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
    f AS (
        SELECT source,
               least(1.0, 300.0 * CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)
                           / CAST(n AS DOUBLE)) AS f
        FROM w, t
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN f USING (source)
    WHERE {o_hash_u('d.doc_id', 21)} < f.f
    ORDER BY d.source, d.doc_id
    """,
)
def sample_temperature_mix(spark, sf_dir):
    """Temperature-based source rebalancing (`sampling.temperature_mix`,
    the XLM-R/mT5 α-sampling scheme at α=0.5): per-source keep fraction
    ∝ sqrt(n_s)/n_s toward a 300-row target — small sources up-weighted.
    The weight is integer-quantized (floor(sqrt(n)·10⁶)) so Σw is exact
    and the fraction is a fixed chain of correctly-rounded IEEE ops;
    the oracle replays weighting, normalization, AND the minstd draw —
    the exact selected row set is verified, not a statistical bound."""
    from palo_spark.operators.sampling import temperature_mix

    d = load_table(spark, sf_dir, "documents")
    return (
        temperature_mix(
            d, "source", "doc_id", target_rows=300, alpha=0.5, seed=21, mode="minstd"
        )
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


_O_MD5_60 = (
    "CAST(list_sum(list_transform(generate_series(1, 15), "
    "i -> (strpos('0123456789abcdef', substr(md5({g}), i, 1)) - 1)::BIGINT "
    "<< (4 * (15 - i)))) AS BIGINT)"
)


@q(
    "sample_dsir_importance",
    r"""
    WITH raw AS (
        SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents
    ),
    tgt AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents WHERE lang = 'en' AND doc_id < 100
    ),
    rg AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(t) - 1, 1)),
                   i -> concat_ws(' ', t[i], t[i+1]))) AS g
        FROM raw
    ),
    tg AS (
        SELECT unnest(list_transform(
                   generate_series(1, greatest(len(t) - 1, 1)),
                   i -> concat_ws(' ', t[i], t[i+1]))) AS g
        FROM tgt
    ),
    rb AS (SELECT doc_id, __MD5G__ % 256 AS b FROM rg),
    tb AS (SELECT __MD5G__ % 256 AS b FROM tg),
    rc AS (SELECT b, COUNT(*) AS rcnt FROM rb GROUP BY b),
    tc AS (SELECT b, COUNT(*) AS tcnt FROM tb GROUP BY b),
    ratios AS (
        SELECT rc.b,
               CAST((CAST(COALESCE(tc.tcnt, 0) AS HUGEINT) * 1000000)
                    // rc.rcnt AS BIGINT) AS ppm
        FROM rc LEFT JOIN tc ON tc.b = rc.b
    ),
    scores AS (
        SELECT rb.doc_id, CAST(SUM(r.ppm) AS BIGINT) AS dsir_score
        FROM rb JOIN ratios r ON r.b = rb.b
        GROUP BY rb.doc_id
    )
    SELECT doc_id, dsir_score FROM scores
    ORDER BY dsir_score DESC, doc_id LIMIT 100
    """.replace("__MD5G__", _O_MD5_60.format(g="g")),
)
def sample_dsir_importance(spark, sf_dir):
    """DSIR-shaped importance selection (`sampling.dsir_select`, Xie et
    al. 2023 arXiv:2302.03169): raw docs ranked by hashed-bigram
    affinity to an English target slice, top-100 kept. The importance
    weight uses the exact-integer rational form — per hashed bucket,
    ``(target_count·10⁶) div raw_count`` with the portable 60-bit md5
    gram hash — so bucketing, ratios, per-doc scores, and the final cut
    all replay in DuckDB value-for-value (logs would differ in libm
    rounding; floor-rational ranks identically). Two bucket-bounded
    aggregations + one broadcast join + a bounded TopN — no raw-row
    window anywhere."""
    from palo_spark.operators.sampling import dsir_select

    d = load_table(spark, sf_dir, "documents")
    tgt = d.filter((F.col("lang") == "en") & (F.col("doc_id") < 100))
    return dsir_select(d, tgt, n=2, buckets=256, top_n=100)
