"""Large-scale training-data pipeline operators.

Beyond the reference's extraction surface, these are the operations a
100 TB web-text pipeline needs around extraction: deduplication,
similarity search, text analysis, and multimodal column plumbing.
All are pure DataFrame compositions (JVM-side, codegen-able) except
where Python is genuinely required, and there it is Arrow-batched.
"""

from goose_parser_spark.ops.bloom import bloom_build, bloom_probe
from goose_parser_spark.ops.dedup import (
    build_minhash_index,
    connected_components,
    dedup_against_index,
    hamming_pairs,
    keep_canonical,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    paragraph_dup_stats,
    shingles,
    simhash,
    simhash_pairs,
    decontaminate_exact,
    line_corpus_dedup,
    verify_pairs_jaccard,
    winnow_fingerprints,
)
from goose_parser_spark.ops.asof import asof_join, range_join, time_rollups
from goose_parser_spark.ops.robots import (
    parse_robots,
    robots_directives,
    robots_filter,
)
from goose_parser_spark.ops.linkgraph import anchor_text_stats, pagerank_int
from goose_parser_spark.ops.crawl import (
    capture_history,
    feed_entries,
    parse_cdx,
    schedule_frontier,
    sitemap_urls,
    snapshot_diff,
)
from goose_parser_spark.ops.classifier import (
    score_logreg_hashed,
    train_logreg_hashed,
)
from goose_parser_spark.ops.metadata import (
    extract_image_text_pairs,
    extract_page_metadata,
)
from goose_parser_spark.ops.retrieval import bm25_topk
from goose_parser_spark.ops.imagecodec import (
    audio_frame_features,
    probe_media,
    decode_audio_pcm,
    decode_image_gray,
    resize_gray_box,
)
from goose_parser_spark.ops.multimodal import (
    audio_features,
    media_probe,
    phash_dct,
    phash_image,
    phash_stub,
)
from goose_parser_spark.ops.sketches import (
    count_min_build,
    count_min_query,
    hll_build,
    hll_estimate,
)
from goose_parser_spark.ops.sampling import (
    assign_shards,
    dsir_logratio,
    hash_split,
    pack_sequences,
    per_domain_quota,
    materialize_sequences,
    sample_by_hash,
    select_token_budget,
    stratified_sample_by_hash,
)
from goose_parser_spark.ops.layout import extract_pdf_pages, parse_pdf_text
from goose_parser_spark.ops.maincontent import extract_main_content
from goose_parser_spark.ops.urls import (
    host_stats,
    psl_rules,
    registered_domain,
    registered_domain_psl,
    resolve_href,
    strip_tracking_params,
    url_canonicalize,
    url_host,
    url_normalize,
)
from goose_parser_spark.ops.similarity import (
    cosine_topk,
    embedding_cosine_pairs,
    ivf_centroids,
    ivf_topk,
    lsh_bucket,
    lsh_cosine_topk,
)
from goose_parser_spark.ops.textstats import (
    normalize_text_nfc,
    perplexity_buckets,
    split_sentences,
    c4_line_filter,
    chunk_documents,
    classifier_score,
    clean_text,
    doc_fingerprint,
    gopher_quality,
    lang_id,
    quality_score,
    redact_pii,
    script_profile,
    repetition_stats,
    tfidf_top_terms,
    token_count,
    readability_scores,
)

__all__ = [
    "exact_dedup", "ngram_jaccard_pairs", "minhash_lsh_dedup", "simhash",
    "shingles", "simhash_pairs", "paragraph_dup_stats", "keep_canonical",
    "connected_components", "winnow_fingerprints", "cosine_topk",
    "embedding_cosine_pairs", "lsh_bucket", "lsh_cosine_topk",
    "ivf_centroids", "ivf_topk",
    "token_count", "quality_score", "lang_id", "doc_fingerprint",
    "gopher_quality", "tfidf_top_terms", "repetition_stats",
    "extract_main_content", "extract_pdf_pages",
    "url_host", "url_normalize", "registered_domain",
    "registered_domain_psl", "psl_rules", "host_stats",
    "sample_by_hash", "per_domain_quota", "hash_split", "pack_sequences",
    "parse_robots", "robots_filter", "robots_directives",
    "asof_join", "range_join", "time_rollups", "redact_pii",
    "build_minhash_index", "dedup_against_index", "verify_pairs_jaccard",
    "assign_shards", "stratified_sample_by_hash", "materialize_sequences",
    "strip_tracking_params", "url_canonicalize", "resolve_href",
    "chunk_documents", "classifier_score", "clean_text",
    "c4_line_filter", "script_profile", "dsir_logratio",
    "bloom_build", "bloom_probe", "pagerank_int", "phash_stub",
    "hamming_pairs", "line_corpus_dedup", "decontaminate_exact", "anchor_text_stats",
    "parse_cdx", "feed_entries", "sitemap_urls", "schedule_frontier",
    "train_logreg_hashed",
    "score_logreg_hashed", "extract_page_metadata",
    "extract_image_text_pairs", "perplexity_buckets", "bm25_topk",
    "split_sentences", "normalize_text_nfc",
    "count_min_build", "count_min_query", "hll_build", "hll_estimate",
    "snapshot_diff", "readability_scores", "phash_dct",
    "select_token_budget", "capture_history", "parse_pdf_text",
    "decode_image_gray", "resize_gray_box", "phash_image",
    "decode_audio_pcm", "audio_frame_features", "audio_features",
    "probe_media", "media_probe",
]
