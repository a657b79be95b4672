"""LLM-training-data pipeline operators.

Large-scale text/dedup/similarity operators over document and embedding
tables — the operations a 100 TB training-data pipeline needs, built
Spark-first (expression compositions inside whole-stage codegen; shuffles
only on aggregation keys; LSH banding instead of all-pairs joins).

Cross-engine determinism: operators that participate in the DuckDB oracle
gate hash with md5 (available and bit-identical in both engines). At 100 TB
you would swap ``F.md5`` for ``F.xxhash64`` (cheaper, JVM-native) — the
operator shapes don't change.
"""

from lotad_spark.pipeline.text import (
    bigram_logprob,
    bow_fingerprint,
    duplicate_lines,
    gopher_rules,
    lang_id,
    normalized_fingerprint,
    pii_scrub,
    quality_score,
    repetition_stats,
    strip_duplicate_lines,
    text_stats,
    blocklist_filter,
    normalize_text,
    tfidf_top_terms,
    tokens,
    unigram_logprob,
)
from lotad_spark.pipeline.dedup import (
    dedup_components,
    exact_dedup,
    minhash_signatures,
    near_dup_against_index,
    near_dup_pairs,
    shingles,
    simhash32,
    simhash_near_dup_pairs,
    write_dedup_index,
)
from lotad_spark.pipeline.similarity import (
    build_ivf_index,
    build_ivf_sq8_index,
    cosine_topk,
    drop_zero_vectors,
    ivf_sq8_topk,
    ivf_topk_indexed,
    embedding_near_dup_pairs,
    ivf_topk,
    quantize_embeddings,
    semantic_dedup,
    prototypicality_prune,
    prototypicality_prune_corpus,
    semantic_dedup_corpus,
)
from lotad_spark.pipeline.multimodal import (
    decode_pixels,
    extract_feature_counts,
    extract_features,
    frame_sample_plan,
    resize_images,
    with_decoded_metadata,
)
from lotad_spark.pipeline.bpe import apply_bpe, bpe_fertility, train_bpe
from lotad_spark.pipeline.sketch import (
    bloom_build,
    bloom_build_terms,
    bloom_contains,
    bloom_prefilter,
    bloom_merge,
    cms_build,
    cms_estimate,
    cms_merge,
)
from lotad_spark.pipeline.retrieval import (
    append_to_bm25_index,
    bm25_against_index,
    bm25_topk,
    write_bm25_index,
)
from lotad_spark.pipeline.dedup import exact_dedup_rows, ngram_jaccard
from lotad_spark.pipeline.spandedup import (
    duplicate_spans,
    duplicate_spans_against_index,
    strip_duplicate_spans,
    write_span_index,
)
from lotad_spark.pipeline.text import winnow_fingerprint
from lotad_spark.pipeline.sampling import (
    chunk_manifest,
    hash_sample,
    mixture_sample,
    sample_key,
    shuffle_batches,
    stratified_cap,
    temperature_rates,
    sliding_token_windows,
    token_chunk_plan,
    train_eval_split,
    upsample_by_weight,
    weighted_sample,
)
from lotad_spark.pipeline.contamination import (
    contaminated_ids,
    contamination_pairs,
)
from lotad_spark.pipeline.curate import curate_corpus, plan_training_corpus
from lotad_spark.pipeline.dsir import (
    bucket_logratios,
    dsir_resample,
    dsir_weights,
    ngram_features,
)

__all__ = [
    "tokens",
    "ngram_features",
    "bucket_logratios",
    "dsir_weights",
    "dsir_resample",
    "text_stats",
    "duplicate_lines",
    "gopher_rules",
    "strip_duplicate_lines",
    "quality_score",
    "lang_id",
    "normalized_fingerprint",
    "bigram_logprob",
    "bow_fingerprint",
    "pii_scrub",
    "repetition_stats",
    "dedup_components",
    "exact_dedup",
    "shingles",
    "minhash_signatures",
    "near_dup_pairs",
    "simhash32",
    "simhash_near_dup_pairs",
    "build_ivf_index",
    "build_ivf_sq8_index",
    "ivf_sq8_topk",
    "cosine_topk",
    "ivf_topk",
    "ivf_topk_indexed",
    "quantize_embeddings",
    "drop_zero_vectors",
    "embedding_near_dup_pairs",
    "semantic_dedup",
    "prototypicality_prune",
    "prototypicality_prune_corpus",
    "semantic_dedup_corpus",
    "ngram_jaccard",
    "winnow_fingerprint",
    "decode_pixels",
    "extract_feature_counts",
    "extract_features",
    "resize_images",
    "frame_sample_plan",
    "with_decoded_metadata",
    "exact_dedup_rows",
    "chunk_manifest",
    "hash_sample",
    "mixture_sample",
    "near_dup_against_index",
    "sample_key",
    "shuffle_batches",
    "stratified_cap",
    "temperature_rates",
    "train_bpe",
    "apply_bpe",
    "bpe_fertility",
    "append_to_bm25_index",
    "bm25_against_index",
    "bm25_topk",
    "write_bm25_index",
    "duplicate_spans",
    "strip_duplicate_spans",
    "write_span_index",
    "duplicate_spans_against_index",
    "blocklist_filter",
    "bloom_build",
    "bloom_build_terms",
    "bloom_contains",
    "bloom_prefilter",
    "bloom_merge",
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "normalize_text",
    "tfidf_top_terms",
    "sliding_token_windows",
    "token_chunk_plan",
    "train_eval_split",
    "weighted_sample",
    "unigram_logprob",
    "upsample_by_weight",
    "write_dedup_index",
    "contaminated_ids",
    "contamination_pairs",
    "curate_corpus",
    "plan_training_corpus",
]
