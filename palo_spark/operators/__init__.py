"""LLM-data-pipeline operators (SURVEY.md §2.8; BASELINE.json north star).

Extensions beyond the Doris reference surface: the operations a
large-scale training-data pipeline needs, built Spark-first so they hold
at 100 TB:

- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram-Jaccard dedup.
- ``similarity`` — brute-force cosine top-k + random-hyperplane LSH ANN.
- ``text``       — tokenization, language ID, quality scoring, token
                   counting, fingerprinting, tf-idf.
- ``multimodal`` — opaque binary media columns with typed metadata and
                   pandas-UDF decode plumbing (decode itself stubbed —
                   image/audio libs are not in this environment).
"""

from palo_spark.operators.cache import release_persisted  # noqa: F401
from palo_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    dedup_exact_keep_best,
    content_hash,
    shingles,
    minhash_signature,
    dedup_minhash,
    simhash,
    simhash_fingerprints,
    dedup_simhash,
    ngram_jaccard_pairs,
    embedding_dup_pairs,
    dedup_embedding_cosine,
    resolve_dup_clusters,
    dedup_by_clusters,
    semantic_dedup,
    substring_dup_docs,
    snapshot_fingerprints,
    dedup_incremental,
)
from palo_spark.operators.similarity import (  # noqa: F401
    cosine_similarity,
    similarity_topk,
    knn_join,
    knn_join_lsh,
    lsh_bucket,
    lsh_band_bits,
    similarity_topk_lsh,
    ivf_assign,
    train_centroids,
    train_centroids_exact,
    similarity_topk_ivf,
    quantize_embeddings_int8,
    normalize_embeddings,
    pca_fit,
    pca_project,
    pq_codebooks,
    pq_encode,
    pq_adc_lut,
    similarity_topk_pq,
    rrf_fuse,
    knn_classify,
    semantic_decontaminate,
)
from palo_spark.operators.ranking import (  # noqa: F401
    global_cumsum,
    global_ntile,
    global_row_number,
)
from palo_spark.operators.temporal import asof_join  # noqa: F401
from palo_spark.operators.text import (  # noqa: F401
    tokenize,
    token_count,
    match_any,
    match_all,
    quality_score,
    lang_id,
    doc_fingerprint,
    tfidf_top_terms,
    bpe_pair_counts,
    bpe_tokenize_vocab,
    bm25_scores,
    chunk_documents,
    redact_pii,
    repetition_score,
    decontaminate,
    pack_sequences,
    contamination_score,
    remove_boilerplate_lines,
    dedup_intra_doc_lines,
    corpus_line_dedup,
    normalize_url,
    dedup_by_url,
    corpus_profile,
    quality_classifier_score,
    perplexity_score,
    gopher_rules,
    gopher_repetition,
)
from palo_spark.operators.multimodal import (  # noqa: F401
    media_schema,
    pack_media,
    extract_media_meta,
    decode_media,
    sample_frames,
    resize_media,
    extract_features,
    encode_wav,
    decode_wav,
    audio_features,
)
from palo_spark.operators.text_index import (  # noqa: F401
    build_text_index,
    match_any_indexed,
    match_all_indexed,
    match_phrase_indexed,
)
from palo_spark.operators.variant import (  # noqa: F401
    variant_schema,
    variant_shred,
)
