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
    row = spark.read.parquet(path + "/_palo_index_meta").head()
    return {"buckets": row["buckets"], "text_col": row["text_col"], "id_col": row["id_col"]}


def _query_buckets(spark, tokens: list[str], buckets: int) -> list[int]:
    """Bucket ids of the query tokens — computed with the SAME xxhash64
    the writer used (one k-row driver-side job; k = |query tokens|)."""
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    rows = df.select(
        F.pmod(F.xxhash64("token"), F.lit(buckets)).alias("b")
    ).collect()
    return sorted({r["b"] for r in rows})


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
