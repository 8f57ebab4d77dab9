"""Deterministic sampling and source mixing for training-data pipelines.

Extension surface (BASELINE.json north star) — no Doris analog; the
operations a 100 TB corpus pipeline needs to cut reproducible subsets
and mix sources to target proportions.

Why not ``df.sample``: Spark's sampler draws per-partition random
streams, so the selected *rows* change whenever partitioning, cluster
size, or upstream order changes. A training corpus must be cut by a
pure function of the ROW (id), so the same doc is in/out of the sample
no matter how the job is partitioned, today or at 1000 executors.
Everything here is a narrow projection+filter — zero shuffles, fully
pushed into the scan stage.

Two hash modes:

- ``xxhash64`` (default): Spark's JVM xxhash64 — best dispersion, the
  production choice; not replayable in other engines (oracle checks are
  rows-only/statistical).
- ``minstd``:  three iterated Lehmer/Park-Miller steps ``h*48271 mod (2^31-1)``
  — pure 64-bit-safe integer arithmetic, bit-identical in any SQL
  engine, used by the oracle-checked suite entries. Dispersion is
  adequate for sampling (not for bucketing joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sample_hash",
    "stratified_sample",
    "mix_sources",
    "assign_split",
    "training_order",
    "sample_token_budget",
    "temperature_mix",
    "dsir_select",
    "MINSTD_MOD",
]

#: Park-Miller modulus (2^31 - 1, prime)
MINSTD_MOD = 2147483647
_MINSTD_MULT = 48271


def _minstd_key(id_col, seed: int):
    """The raw iterated-Lehmer key in [0, 2^31-1) — exact BIGINT math
    (every intermediate < 2^47), identically replayable in any engine
    (see :func:`o_minstd_key`). Shared by the ``minstd`` uniform and
    :func:`training_order`'s integer shard/order keys."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.pmod(c.cast("long") + F.lit(int(seed)), F.lit(MINSTD_MOD))
    for _ in range(3):
        h = F.pmod(h * F.lit(_MINSTD_MULT), F.lit(MINSTD_MOD))
    return h


def o_minstd_key(id_expr: str, seed: int) -> str:
    """Oracle-SQL mirror of :func:`_minstd_key` (exact integer math)."""
    h = (
        f"((CAST({id_expr} AS BIGINT) + {seed}) % {MINSTD_MOD} "
        f"+ {MINSTD_MOD}) % {MINSTD_MOD}"
    )
    for _ in range(3):
        h = f"({h}) * {_MINSTD_MULT} % {MINSTD_MOD}"
    return f"({h})"


def _hash_u(id_col, seed: int, mode: str):
    """Uniform value in [0, 1) as a pure function of (id, seed)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if mode == "xxhash64":
        # map signed 64-bit hash onto [0,1): shift to unsigned via
        # DECIMAL to avoid Long overflow at the +2^63 edge
        # 2^63 exceeds Long — route the shift constant through a string
        # literal cast to DECIMAL
        h = F.xxhash64(c, F.lit(seed)).cast("decimal(38,0)") + F.lit(
            "9223372036854775808"
        ).cast("decimal(38,0)")
        return (h.cast("double") / F.lit(float(2**64)))
    if mode == "minstd":
        # THREE iterated Lehmer rounds (see _minstd_key). One round is
        # not enough: for a small contiguous id range the product never
        # wraps the modulus, leaving an ordered ramp (id<44k =>
        # u<0.001*id) that ruins fraction sampling; rounds 2-3 wrap
        # thousands of times, scattering any realistic id range.
        return _minstd_key(c, seed).cast("double") / F.lit(float(MINSTD_MOD))
    raise ValueError(f"unknown hash mode {mode!r}")


def o_hash_u(id_expr: str, seed: int) -> str:
    """Oracle-SQL mirror of the ``minstd`` hash → uniform [0,1)."""
    h = f"((CAST({id_expr} AS BIGINT) + {seed}) % {MINSTD_MOD} + {MINSTD_MOD}) % {MINSTD_MOD}"
    for _ in range(3):
        h = f"({h}) * {_MINSTD_MULT} % {MINSTD_MOD}"
    return f"(CAST({h} AS DOUBLE) / {float(MINSTD_MOD)!r})"


def sample_hash(
    df: DataFrame,
    id_col: str,
    fraction: float,
    *,
    seed: int = 0,
    mode: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff ``hash(id, seed)/MAX < fraction``.

    Deterministic and partitioning-independent: re-running on a
    repartitioned, resorted, or differently-sized cluster selects the
    SAME rows. Changing ``seed`` draws an independent sample; nested
    fractions are consistent (a 1% sample is a subset of the 10% sample
    at the same seed) — useful for staged experiments.
    """
    return df.filter(_hash_u(id_col, seed, mode) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    *,
    default: float = 0.0,
    seed: int = 0,
    mode: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum ``v`` keeps fraction
    ``fractions[v]`` of its rows (strata absent from the map keep
    ``default``). One narrow filter — the 100 TB form of "rebalance the
    language/source distribution of a corpus"; no shuffle, no
    per-stratum jobs."""
    frac = F.lit(float(default))
    for value, f_v in fractions.items():
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(f_v))).otherwise(
            frac
        )
    return df.filter(_hash_u(id_col, seed, mode) < frac)


def mix_sources(
    sources: list[tuple[DataFrame, float]],
    id_col: str,
    *,
    seed: int = 0,
    mode: str = "xxhash64",
    tag_col: str | None = "mix_epoch",
) -> DataFrame:
    """Weighted mixture of corpora: each ``(df, weight)`` contributes
    its rows ``weight`` times in expectation — ``weight=0.25``
    downsamples to a quarter; ``weight=2.5`` yields every row twice
    plus a deterministic half-sample (epoch upsampling, the standard
    way to over-represent a high-quality source in a training mix).

    Rows are replicated via an exploded epoch-index array (narrow op);
    the fractional remainder reuses :func:`sample_hash` with a
    per-epoch seed so repeated epochs and the fractional draw are
    independent. Output schema = input schema (+ ``tag_col`` epoch
    number unless None). Union of narrow ops — shuffle-free.
    """
    out = None
    for i, (df, weight) in enumerate(sources):
        if weight <= 0:
            continue
        whole, frac = int(weight), float(weight) - int(weight)
        parts = []
        if whole:
            rep = df.withColumn(
                "__epoch", F.explode(F.sequence(F.lit(0), F.lit(whole - 1)))
            )
            parts.append(rep)
        if frac > 0:
            extra = sample_hash(
                df, id_col, frac, seed=seed + 1000003 * (i + 1), mode=mode
            ).withColumn("__epoch", F.lit(whole))
            parts.append(extra)
        for p in parts:
            p = (
                p.withColumnRenamed("__epoch", tag_col)
                if tag_col
                else p.drop("__epoch")
            )
            out = p if out is None else out.unionByName(p)
    if out is None:
        raise ValueError("no source with positive weight")
    return out


def assign_split(
    df: DataFrame,
    id_col: str,
    splits: dict,
    *,
    seed: int = 0,
    mode: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the split
    whose cumulative-fraction interval contains ``hash(id, seed)``.

    The fractions must sum to 1.0 (±1e-9). Like :func:`sample_hash`,
    assignment is a pure function of the row id — stable across
    partitioning, cluster size, and reruns, so a document can never
    migrate between train and test when the corpus is re-sharded (the
    property that prevents silent eval leakage). One narrow projection.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    u = _hash_u(id_col, seed, mode)
    expr = None
    acc = 0.0
    items = list(splits.items())
    for name, frac in items[:-1]:
        acc += float(frac)
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def split_by_group(
    df: DataFrame,
    group_col,
    id_col: str,
    splits: dict,
    *,
    seed: int = 0,
    mode: str = "minstd",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: every row of a GROUP receives
    the same split, so duplicates / near-duplicates sharing a group key
    (content fingerprint, dedup cluster id, URL host, …) can never
    straddle train and test — the contamination guard row-level
    :func:`assign_split` cannot give.

    Group identity is reduced to ``MIN(id_col)`` within the group — a
    deterministic integer any engine reproduces — and that group id is
    hashed exactly like :func:`assign_split`. Cost: ONE keyed shuffle
    (the per-group min window); the assignment itself stays a narrow
    projection. At 100 TB the group key should be the already-computed
    fingerprint/cluster column, so no extra corpus pass is added.
    """
    gcol = F.col(group_col) if isinstance(group_col, str) else group_col
    gid = F.min(F.col(id_col)).over(Window.partitionBy(gcol))
    tagged = df.withColumn("__split_gid", gid)
    out = assign_split(
        tagged, "__split_gid", splits, seed=seed, mode=mode, out_col=out_col
    )
    return out.drop("__split_gid")


def training_order(
    df: DataFrame,
    id_col: str,
    *,
    shards: int = 64,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle for training-data layout: every row
    gets a ``(shard, pos)`` address — ``shard`` = which output shard
    file it belongs to, ``pos`` = its position within that shard — as a
    pure function of ``(id, seed)``. Writing shard ``s`` sorted by
    ``pos`` reproduces the exact same globally-shuffled training order
    on any cluster size, any input partitioning, any rerun; bumping
    ``seed`` is a fresh epoch permutation.

    Mechanics: the ``minstd`` iterated-Lehmer hash (exact BIGINT math,
    replayable in any engine — see :func:`_hash_u`) gives each row a
    pseudorandom key; ``shard`` = a second-round hash mod ``shards`` so
    shard membership and intra-shard order are independent; ``pos`` =
    rank of (key, id) within the shard — ONE window per shard, i.e. the
    ranking parallelizes across shards (never a global single-partition
    sort). Ties broken by id, so the order is total and deterministic.

    At 100 TB: one hash-partitioned shuffle on ``shard`` (uniform by
    construction — the hash is the partitioner), then an in-partition
    sort; equivalent plan shape to a bucketed table write. Downstream
    ``write.partitionBy(shard)`` + readers streaming shards in pos
    order is the standard fixed-order training-data serving layout.
    """
    key = _minstd_key(id_col, seed)
    shard = F.pmod(
        (key + F.lit(1)) * F.lit(_MINSTD_MULT), F.lit(MINSTD_MOD)
    ) % F.lit(shards)
    out = df.withColumn("__key", key).withColumn(shard_col, shard.cast("int"))
    w = Window.partitionBy(shard_col).orderBy("__key", id_col)
    return (
        out.withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("__key")
    )


def o_training_order(id_expr: str, shards: int, seed: int) -> str:
    """Oracle-SQL mirror of :func:`training_order`'s shard/key columns
    (the ``pos`` ranking is then a plain ``ROW_NUMBER``)."""
    key = f"CAST({o_hash_u(id_expr, seed)} * {MINSTD_MOD} AS BIGINT)"
    return (
        f"{key} AS __key, "
        f"CAST((({key} + 1) * {_MINSTD_MULT} % {MINSTD_MOD}) % {shards} "
        f"AS INT) AS shard"
    )


def heavy_hitters(
    df, col: str, k: int = 10, capacity: int = 1024
):
    """Approximate top-k frequent values via the Space-Saving sketch
    (Metwally et al., "Efficient Computation of Frequent and Top-k
    Elements in Data Streams") — the mergeable-summary shape Doris's
    TOPN aggregate runs natively [upstream: be/src/vec/aggregate_functions/
    aggregate_function_topn.h, which implements the same counter map].

    Scale design: one ``mapInPandas`` pass emits a bounded counter map
    per PARTITION (≤ ``capacity`` entries each — O(capacity), never
    O(rows)); partials merge on the driver with the standard
    space-saving merge (sum matching counters, offset absent ones by
    the victim error bound). Guarantees: estimated count ≥ true count,
    error ≤ Σ of per-partial minimum counts; when ``capacity`` exceeds
    the column's NDV the sketch is EXACT (no eviction ever happens) —
    the property the suite oracle exploits.

    Returns a DataFrame (value, est_count, max_err) of the top-k by
    estimated count, built on the driver from the merged bounded map.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    def part(batches):
        counts: dict = {}
        evict_min = 0
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                v = str(v)
                if v in counts:
                    counts[v][0] += 1
                elif len(counts) < capacity:
                    counts[v] = [1, 0]
                else:
                    # space-saving eviction: replace the min counter
                    victim = min(counts, key=lambda x: counts[x][0])
                    vmin = counts[victim][0]
                    del counts[victim]
                    counts[v] = [vmin + 1, vmin]
                    evict_min = max(evict_min, vmin)
        yield pd.DataFrame(
            {
                "value": list(counts),
                "cnt": [c[0] for c in counts.values()],
                "err": [c[1] for c in counts.values()],
            }
        )

    parts = df.select(F.col(col).alias(col)).mapInPandas(
        part, "value string, cnt long, err long"
    ).collect()
    # driver-side merge of bounded partials (≤ capacity × partitions
    # rows total — never data-sized)
    merged: dict = {}
    for r in parts:
        merged.setdefault(r["value"], [0, 0])
        merged[r["value"]][0] += r["cnt"]
        merged[r["value"]][1] += r["err"]
    top = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(v, c[0], c[1]) for v, c in top],
        "value string, est_count long, max_err long",
    )


def grouped_heavy_hitters(
    df, group_col: str, col: str, k: int = 3, capacity: int = 256
):
    """Per-group space-saving top-k (the per-group form Doris's
    ``TOPN(col, k)`` aggregate runs): one hash shuffle on the group key,
    then a bounded space-saving counter map per group inside
    ``applyInPandas`` — O(capacity) state per group regardless of group
    size, the property that makes per-group top-k safe under skew.
    Exact when ``capacity`` ≥ the group's NDV (same guarantee as
    :func:`heavy_hitters`); estimates only ever overestimate.

    Returns (group, value, est_count, max_err, rank) rows, rank 1..k by
    estimated count (ties broken by value for determinism).
    """
    import pandas as pd

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        counts: dict = {}
        for v in pdf[col]:
            if v is None:
                continue
            v = str(v)
            if v in counts:
                counts[v][0] += 1
            elif len(counts) < capacity:
                counts[v] = [1, 0]
            else:
                victim = min(counts, key=lambda x: counts[x][0])
                vmin = counts[victim][0]
                del counts[victim]
                counts[v] = [vmin + 1, vmin]
        top = sorted(counts.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        g = pdf[group_col].iloc[0]
        return pd.DataFrame(
            {
                group_col: [g] * len(top),
                "value": [t[0] for t in top],
                "est_count": [t[1][0] for t in top],
                "max_err": [t[1][1] for t in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    gtype = dict(df.dtypes)[group_col]
    return df.select(group_col, col).groupBy(group_col).applyInPandas(
        per_group,
        f"{group_col} {gtype}, value string, est_count long, max_err long, rank int",
    )


def sample_token_budget(
    df: DataFrame,
    id_col: str,
    *,
    budget: int,
    group_col: str | None = None,
    n_tokens_col: str | None = None,
    text_col: str = "text",
    seed: int = 0,
    mode: str = "minstd",
) -> DataFrame:
    """Token-budget quota sampling: keep documents in deterministic
    hash-priority order until each group's token budget fills — the
    "give me ~10B tokens per source" step of corpus assembly, as a
    partitioning-independent filter (same selection on any cluster
    layout / re-run, like :func:`sample_hash`).

    A doc is kept iff the cumulative token count of strictly-higher-
    priority docs in its group is < ``budget`` — so the first doc of a
    group is always kept and the selection overshoots by at most one
    document (the boundary doc), the standard quota convention. One
    window per group (cumulative sum over the priority order);
    ``group_col=None`` runs a single global window — fine for a
    post-aggregation frame, but at corpus scale ALWAYS pass a group
    (source, language, shard): per-group windows shuffle once on the
    group key and parallelize across groups.
    """
    from palo_spark.operators.text import token_count

    ntok = (
        F.col(n_tokens_col)
        if n_tokens_col
        else token_count(F.col(text_col), mode="whitespace")
    )
    staged = df.withColumn("__ntok", ntok.cast("long")).withColumn(
        "__pr", _hash_u(id_col, seed, mode)
    )
    keys = [group_col] if group_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy("__pr", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("__ntok").over(w), F.lit(0))
    return (
        staged.withColumn("__before", cum_before)
        .filter(F.col("__before") < F.lit(int(budget)))
        .drop("__ntok", "__pr", "__before")
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    *,
    target_rows: int,
    alpha: float = 0.5,
    seed: int = 0,
    mode: str = "minstd",
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-LM
    α-sampling scheme — XLM-R / mT5 style: sample source s with
    probability ∝ n_s^α, α < 1 up-weighting small sources), expressed
    as a deterministic partitioning-independent filter.

    Per-source keep fraction: ``f_s = min(1, target_rows · w_s / Σw / n_s)``
    with ``w_s = floor(sqrt(n_s)·10⁶)`` for the default α = 0.5 — the
    integer-quantized weight makes Σw exact and the whole fraction a
    fixed chain of correctly-rounded IEEE ops, so an oracle replays the
    selection bit-for-bit (general α uses pow(), whose libm rounding is
    engine-specific; α=0.5 is the deterministic form, and the plan
    shape is identical for any α). Selection itself is the
    :func:`sample_hash` uniform — same rows on any cluster layout.

    Plan: one tiny per-source aggregate, broadcast back (|sources|
    rows), then a narrow filter — no full-data shuffle.
    """
    if alpha != 0.5:
        raise NotImplementedError(
            "alpha != 0.5 needs engine-specific pow(); use 0.5 (sqrt) "
            "for oracle-replayable selection or fork this operator"
        )
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    w = counts.withColumn(
        "__w", F.floor(F.sqrt(F.col("__n").cast("double")) * 1e6).cast("long")
    )
    tot = w.agg(F.sum("__w").alias("__tw"))
    frac = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "__f",
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows))
                * F.col("__w").cast("double")
                / F.col("__tw").cast("double")
                / F.col("__n").cast("double"),
            ),
        )
        .select(source_col, "__f")
    )
    return (
        df.join(F.broadcast(frac), source_col)
        .filter(_hash_u(id_col, seed, mode) < F.col("__f"))
        .drop("__f")
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    buckets: int = 256,
    top_n: int = 100,
) -> DataFrame:
    """DSIR-shaped data selection (Data Selection via Importance
    Resampling — Xie et al. 2023, arXiv:2302.03169): rank raw-corpus
    documents by how much their hashed n-gram profile resembles a small
    target domain, keep the top ``top_n``.

    DSIR's importance weight is a log-likelihood ratio over hashed
    n-gram features. Logs are transcendental — libm rounding differs
    across engines — so this implementation uses the RATIONAL form that
    preserves the same ranking signal with exact integer arithmetic:

    - bucket every word n-gram with the portable 60-bit md5 hash
      (``dedup.md5_token_hash`` pattern) mod ``buckets``;
    - per bucket ``b``: ``ratio_ppm(b) = (target_count(b) · 10⁶)
      div raw_count(b)`` — floor division of exact BIGINTs (every
      scored gram's bucket occurs in the raw counts by construction,
      so the divisor is ≥ 1);
    - doc score = Σ ``ratio_ppm(bucket(g))`` over the doc's grams
      (with multiplicity); top ``top_n`` by (score desc, id).

    Shape at 100 TB (r12 form): ONE gram-explode pass over the corpus
    reduces to the per-doc bucket histogram (≤ ``buckets`` rows per
    doc — persisted cheaply at any scale); global bucket totals roll up
    from the histogram, the ratio table broadcasts, and scoring is one
    keyed sum of ``count × ppm`` per doc — identical to the per-gram
    sum by distributivity. The cut is a bounded TopN heap,
    checkpointed; no window over raw rows, no driver data collect.
    """
    from palo_spark.operators.dedup import md5_token_hash
    from palo_spark.operators.text import _word_ngrams

    def gram_buckets(df):
        g = F.explode(_word_ngrams(text_col, n)).alias("__g")
        return df.select(F.col(id_col).alias("__id"), g).select(
            "__id", F.pmod(md5_token_hash(F.col("__g")), F.lit(buckets)).alias("__b")
        )

    raw_b = gram_buckets(corpus)
    # Per-doc bucket histogram FIRST (r12, guide §2.3 "aggregate before
    # you shuffle"): the gram explode + md5 bucketing is the expensive
    # corpus pass, and both the global bucket totals AND the per-doc
    # scoring need it — consuming raw grams twice re-ran that pass per
    # branch. The histogram is ≤ ``buckets`` rows per doc (corpus-sized
    # bound: docs × 256, a sliver of the gram table), so it persists
    # cheaply at any scale; global counts roll up from it exactly
    # (Σ __n per bucket ≡ gram count per bucket) and the score is the
    # same sum with multiplicity (Σ ppm over grams ≡ Σ __n·ppm over
    # buckets). One explode pass total, smaller second shuffle.
    from palo_spark.operators.cache import _materialize

    doc_b = raw_b.groupBy("__id", "__b").agg(F.count("*").alias("__n"))
    # decision-frame batcher (r13, §1.2 job-count floor): ONE eager
    # checkpoint of the histogram replaces the persist + force-count +
    # top-n-checkpoint pair — the ratio and score branches read the
    # stored blocks, and the bounded top-n cut is returned LAZY.
    doc_b = _materialize(doc_b)
    raw_counts = doc_b.groupBy("__b").agg(F.sum("__n").alias("__rc"))
    tgt_counts = (
        gram_buckets(target).groupBy("__b").agg(F.count("*").alias("__tc"))
    )
    ratios = (
        raw_counts.join(tgt_counts, "__b", "left")
        .select(
            "__b",
            F.expr(
                "CAST((CAST(coalesce(__tc, 0) AS DECIMAL(38,0)) * 1000000)"
                " DIV __rc AS BIGINT)"
            ).alias("__ppm"),
        )
    )
    scores = (
        doc_b.join(F.broadcast(ratios), "__b")
        .groupBy("__id")
        .agg(F.sum(F.col("__n") * F.col("__ppm")).cast("long").alias("dsir_score"))
    )
    out = (
        corpus.join(
            scores.withColumnRenamed("__id", id_col), id_col
        )
        .select(id_col, "dsir_score")
        .orderBy(F.desc("dsir_score"), id_col)
        .limit(top_n)
    )
    return out
