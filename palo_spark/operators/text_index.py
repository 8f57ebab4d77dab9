"""Storage-side inverted text index: posting lists as a hash-bucketed
parquet layout, so selective MATCH predicates prune FILES instead of
full-scanning the corpus.

Doris accelerates ``MATCH_ANY/ALL/PHRASE`` by consulting per-segment
posting lists before touching row data (upstream:
``be/src/olap/rowset/segment_v2/inverted_index_reader.cpp``). Spark has
no segment-local index hook, so the Spark-first equivalent is a LAYOUT,
not a reader patch:

- :func:`build_text_index` writes ``(token, doc_id)`` postings
  partitioned by ``pmod(xxhash64(token), buckets)`` — the on-disk
  analog of the posting list, where Spark's partition pruning plays the
  role of the index lookup.
- A MATCH over ``k`` query tokens reads at most ``k`` of ``buckets``
  posting partitions (``tb IN (...)`` prunes at the file listing — no
  data files outside those directories are opened), resolves matching
  ``doc_id``s, and left-semi-joins the corpus. At 100 TB the posting
  side is a fraction of corpus bytes and the semi-join broadcasts the
  (small, selective) id set — the corpus scan itself can then prune on
  an id-range/bucket layout.
- ``match_phrase`` uses the index only to PRUNE (all tokens present);
  adjacency is verified on the surviving candidates with the exact
  row-level predicate — prune → verify, the same two-phase shape Doris
  runs.

Pruning is machine-checked by
``tests/test_plans.py::test_text_index_prunes_posting_files`` (counts
distinct files physically touched via ``input_file_name``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from palo_spark.operators.text import match_phrase, tokenize

#: partition column of the posting table
_TB = "tb"


def build_text_index(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    skip_if_current: bool = False,
    version: str | None = None,
) -> None:
    """Write the inverted index for ``df`` at ``path``: distinct
    ``(token, doc_id)`` postings, hash-partitioned into ``buckets``
    directories by token. One explode + one distinct (keyed shuffle);
    the per-partition file count stays bounded because each output task
    writes at most ``buckets`` files and AQE coalesces small shuffles.

    Size ``buckets`` so one bucket ≈ one scan task's worth of posting
    bytes at the target corpus (more buckets = finer pruning, more
    files).

    ``skip_if_current=True`` no-ops when the on-disk index is current
    for the same corpus and parameters — the Doris posture, where the
    inverted index is maintained at LOAD time and queries only read it.
    Freshness is decided by ``version`` when given: a caller-supplied
    monotonic mutation token (a ``Table``'s mutation counter, or
    :func:`source_version` for immutable parquet) compared against the
    stored one — O(1) metadata, NO corpus scan on the query path. Only
    when no token exists does it fall back to fingerprinting the corpus
    (count + xxhash64 fold over (id, text) — one narrow aggregate).
    """
    spark = df.sparkSession
    fp = None
    if skip_if_current:
        if version is not None:
            fp = "v:" + version
        else:
            agg = df.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64(F.col(id_col), F.col(text_col))).alias("h"),
            ).head()
            fp = f"{agg['n']}:{agg['h']}"
        try:
            row = spark.read.parquet(path + "/_palo_index_meta").head()
            meta = row.asDict()
            if (
                meta.get("buckets") == buckets
                and meta.get("text_col") == text_col
                and meta.get("id_col") == id_col
                and meta.get("fingerprint") == fp
            ):
                return
        except Exception:
            pass  # absent/old-format index → build
    posting = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokenize(text_col))).alias("token"),
        )
        .withColumn(_TB, F.pmod(F.xxhash64("token"), F.lit(buckets)))
    )
    # align write tasks with buckets: without this every map task writes
    # up to `buckets` files (tasks × buckets small files — the classic
    # dynamic-partition-write explosion); with it each bucket lands in
    # exactly one task → one file per bucket dir
    posting = posting.repartition(buckets, F.col(_TB))
    posting.write.mode("overwrite").partitionBy(_TB).parquet(path)
    # self-describing index: readers must bucket query tokens with the
    # SAME modulus the writer used — a mismatched guess silently probes
    # empty partitions, so the index carries its parameters
    spark.createDataFrame(
        [(int(buckets), text_col, id_col, fp)],
        "buckets int, text_col string, id_col string, fingerprint string",
    ).write.mode("overwrite").parquet(path + "/_palo_index_meta")


def source_version(path: str) -> str:
    """Mutation token for an immutable file corpus: a fold over the
    source files' (name, size, mtime) — filesystem METADATA only, cost
    O(#files) stat calls, zero data read. Any rewrite of the source
    changes the token; suitable as ``build_text_index(version=...)``
    for parquet corpora that have no table mutation ledger."""
    import hashlib
    import os

    # Nanosecond mtime + root-relative path (ADVICE r6): whole-second
    # mtime made a same-size rewrite within one second (fixture
    # regenerated back-to-back) yield an unchanged token, serving a
    # stale index as current; basename-only keys folded identically
    # sized same-named files in different subdirectories together.
    parts = []
    if os.path.isfile(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
    else:
        for dirpath, _dirs, files in sorted(os.walk(path)):
            rel = os.path.relpath(dirpath, path)
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                st = os.stat(os.path.join(dirpath, f))
                parts.append(f"{rel}/{f}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def _index_meta(spark, path: str) -> dict:
    """Index parameters from the meta file — read driver-side with
    pyarrow (a one-row file; a Spark job here would add a fixed
    ~0.2-0.4 s of scheduling per MATCH query for nothing)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path + "/_palo_index_meta").to_pylist()[0]
    return {"buckets": t["buckets"], "text_col": t["text_col"], "id_col": t["id_col"]}


# XXH64 constants (Collet's xxHash, public domain spec) — Spark's
# ``xxhash64`` is XXH64 over the UTF-8 bytes with seed 42.
_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_str(s: str, seed: int = 42) -> int:
    """Pure-Python XXH64 of a string's UTF-8 bytes, bit-identical to
    Spark's ``F.xxhash64(string_col)`` (seed 42) — pinned by
    ``tests/test_plans.py::test_python_xxhash64_matches_spark``. Lets
    the MATCH planner bucket query tokens driver-side instead of
    launching a Spark job per query. Returns the SIGNED 64-bit value
    Spark reports."""
    data = s.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XP1) & _M64
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _XP2) & _M64, 31) * _XP1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _XP2) & _M64, 31) * _XP1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _XP2) & _M64, 31) * _XP1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _XP2) & _M64, 31) * _XP1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _XP2) & _M64, 31) * _XP1) & _M64
            h = (h * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * _XP2) & _M64, 31) * _XP1) & _M64
        h = (_rotl(h ^ k, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * _XP1) & _M64), 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _XP5) & _M64), 11) * _XP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= 1 << 63 else h


def _query_buckets(spark, tokens: list[str], buckets: int) -> list[int]:
    """Bucket ids of the query tokens — the SAME ``pmod(xxhash64(t),
    buckets)`` the writer used, computed driver-side (pure-Python
    XXH64; k = |query tokens| values, no Spark job)."""
    return sorted({xxhash64_str(t) % buckets for t in tokens})


def _matching_ids(spark, index_path: str, query: str, mode: str):
    tokens = sorted(set(query.lower().split()))
    buckets = _index_meta(spark, index_path)["buckets"]
    bs = _query_buckets(spark, tokens, buckets)
    posting = (
        spark.read.parquet(index_path)
        .filter(F.col(_TB).isin(bs))  # partition (file) pruning
        .filter(F.col("token").isin(tokens))
    )
    if mode == "any":
        return posting.select("doc_id").distinct()
    # all: a doc must hold every distinct query token
    return (
        posting.groupBy("doc_id")
        .agg(F.countDistinct("token").alias("__nt"))
        .filter(F.col("__nt") == len(tokens))
        .select("doc_id")
    )


def match_any_indexed(
    corpus: DataFrame,
    index_path: str,
    query: str,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``corpus`` matching ``MATCH_ANY(query)``, resolved via
    the posting index (reads ≤ |tokens| of the index's bucket
    partitions, then a left-semi join — broadcast when the id set is
    selective). Bucket count comes from the index's own metadata."""
    spark = corpus.sparkSession
    ids = _matching_ids(spark, index_path, query, "any")
    return corpus.join(
        ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )


def match_all_indexed(
    corpus: DataFrame,
    index_path: str,
    query: str,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows matching ``MATCH_ALL(query)`` via the posting index."""
    spark = corpus.sparkSession
    ids = _matching_ids(spark, index_path, query, "all")
    return corpus.join(
        ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )


def match_phrase_indexed(
    corpus: DataFrame,
    index_path: str,
    query: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows matching ``MATCH_PHRASE(query)``: the index prunes to docs
    containing ALL tokens (cheap, file-pruned), the exact adjacency
    predicate runs on those candidates only."""
    cands = match_all_indexed(corpus, index_path, query, id_col=id_col)
    return cands.filter(match_phrase(text_col, query))


# ---------------------------------------------------------------------------
# NGRAM_BF / BITMAP value indexes — the same hash-bucketed posting
# layout, keyed by character n-grams (LIKE '%needle%' acceleration,
# Doris `USING NGRAM_BF`) or by whole column values (equality/IN
# acceleration, Doris `USING BITMAP` and the `bloom_filter_columns`
# table property).
#
# Doris keeps a bloom filter per segment and skips segments whose
# filter cannot contain the probe ([docs: index/ngram-bloomfilter-index,
# index/bloomfilter]). Spark has no segment hook, so the adaptation is
# the SAME layout trick as the inverted index above: postings
# partitioned by pmod(xxhash64(key), buckets), where Spark's partition
# pruning on the bucket column plays the role of the bloom-filter
# skip — a probe reads at most |probe keys| of `buckets` posting
# directories, never the corpus. Resolution is prune → verify: the
# candidate id set is by construction a SUPERSET of the true matches
# (a string containing the needle contains every one of its grams; a
# value equal to the literal IS the posting key), and the original
# row-level predicate always re-runs on the survivors, so the rewrite
# is exactness-preserving for every table model, merge-on-read
# included (the index is built over the MERGED view).


def _gram_array(col: str, n: int):
    """Case-sensitive character ``n``-grams of a string column as an
    array, JVM-side (sequence + transform + substring — no UDF). A
    value shorter than ``n`` grams to the empty array: such rows can
    never match a LIKE needle of length >= n, and the builder's explode
    drops them from the postings."""
    c = f"`{col}`"
    return F.expr(
        f"CASE WHEN length({c}) >= {n} THEN "
        f"transform(sequence(1, length({c}) - {n} + 1), "
        f"i -> substring({c}, i, {n})) "
        f"ELSE array() END"
    ).cast("array<string>")


def needle_grams(needle: str, n: int) -> list[str]:
    """Driver-side twin of :func:`_gram_array` for a literal probe."""
    return sorted({needle[i : i + n] for i in range(len(needle) - n + 1)})


def build_gram_index(
    df: DataFrame,
    path: str,
    *,
    col: str,
    id_col: str,
    gram_size: int = 0,
    buckets: int = 64,
    skip_if_current: bool = False,
    version: str | None = None,
) -> None:
    """Write an n-gram (``gram_size >= 2``) or whole-value
    (``gram_size == 0``) posting index for ``df.col`` at ``path``.

    Same write shape and freshness contract as
    :func:`build_text_index`: one explode + one distinct keyed shuffle,
    bucket-aligned write tasks (one file per bucket directory), and a
    self-describing meta file so readers bucket probes with the
    writer's modulus; ``version`` short-circuits the rebuild O(1) when
    the backing table's mutation token is unchanged."""
    spark = df.sparkSession
    fp = "v:" + version if version is not None else None
    if skip_if_current and fp is not None:
        try:
            meta = spark.read.parquet(path + "/_palo_index_meta").head().asDict()
            if (
                meta.get("buckets") == buckets
                and meta.get("text_col") == col
                and meta.get("id_col") == id_col
                and meta.get("gram_size") == gram_size
                and meta.get("fingerprint") == fp
            ):
                return
        except Exception:
            pass  # absent/old-format index -> build
    if gram_size:
        keys = F.array_distinct(_gram_array(col, gram_size))
    else:
        # whole-value posting: one key per row; NULL values produce no
        # posting (equality with NULL never matches anyway)
        keys = F.array(F.col(col).cast("string"))
    posting = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(keys).alias("token"),
        )
        .where(F.col("token").isNotNull())
        .distinct()
        .withColumn(_TB, F.pmod(F.xxhash64("token"), F.lit(buckets)))
    )
    posting = posting.repartition(buckets, F.col(_TB))
    posting.write.mode("overwrite").partitionBy(_TB).parquet(path)
    # id_type makes the read side schema-explicit: an EMPTY corpus
    # (fresh/truncated table) writes zero part-files, and a
    # schema-inferring read of that would fail UNABLE_TO_INFER_SCHEMA
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    )[id_col]
    spark.createDataFrame(
        [(int(buckets), col, id_col, int(gram_size), id_type, fp)],
        "buckets int, text_col string, id_col string, gram_size int, "
        "id_type string, fingerprint string",
    ).write.mode("overwrite").parquet(path + "/_palo_index_meta")


def _posting_for(spark, index_path: str, tokens: list[str], meta=None):
    """Posting rows for exactly ``tokens`` — reads only the bucket
    partitions the probes hash to (the bloom-skip analog). The schema
    comes from the index meta, never inference: an empty index (built
    over a fresh or truncated table) has zero part-files. Pass ``meta``
    when the caller already read it (one metadata read per probe)."""
    if meta is None:
        import pyarrow.parquet as pq

        meta = pq.read_table(index_path + "/_palo_index_meta").to_pylist()[0]
    bs = _query_buckets(spark, tokens, meta["buckets"])
    id_type = meta.get("id_type") or "bigint"
    return (
        spark.read.schema(f"doc_id {id_type}, token string, {_TB} int")
        .parquet(index_path)
        .filter(F.col(_TB).isin(bs))
        .filter(F.col("token").isin(tokens))
    )


def like_candidate_ids(spark, index_path: str, needle: str) -> DataFrame:
    """Ids whose indexed column contains EVERY gram of ``needle`` — a
    superset of the rows matching ``LIKE '%needle%'``; the caller must
    re-verify with the exact predicate (prune -> verify)."""
    import pyarrow.parquet as pq

    meta = pq.read_table(index_path + "/_palo_index_meta").to_pylist()[0]
    n = meta["gram_size"]
    if not n or len(needle) < n:
        raise ValueError(
            f"needle shorter than gram_size={n}: index cannot prune"
        )
    grams = needle_grams(needle, n)
    return (
        _posting_for(spark, index_path, grams, meta)
        .groupBy("doc_id")
        .agg(F.countDistinct("token").alias("__ng"))
        .filter(F.col("__ng") == len(grams))
        .select("doc_id")
    )


def value_candidate_ids(spark, index_path: str, value: str) -> DataFrame:
    """Ids whose indexed column equals ``value`` (compared as strings —
    the posting key type). Exact, not probabilistic: postings store the
    key itself, so unlike a real bloom filter there are no false
    positives; the session still keeps the original predicate in place
    as a residual, which makes the rewrite trivially sound under any
    type-coercion subtlety."""
    return (
        _posting_for(spark, index_path, [value])
        .filter(F.col("token") == value)
        .select("doc_id")
        .distinct()
    )
