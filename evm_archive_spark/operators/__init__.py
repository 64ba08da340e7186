"""Operator library — lazily re-exported headline API.

``from evm_archive_spark.operators import minhash_near_duplicates`` etc.
resolve through PEP 562 module ``__getattr__`` so importing the package
costs nothing and submodules stay cycle-free.
"""

from __future__ import annotations

import importlib

_EXPORTS = {
    # dedup
    "exact_dedup_by_content": "dedup",
    "minhash_near_duplicates": "dedup",
    "simhash_near_duplicates": "dedup",
    "ngram_jaccard_pairs": "dedup",
    "set_similarity_join": "dedup",
    "line_dedup": "dedup",
    "cross_doc_span_dedup": "dedup",
    "build_postings": "retrieval",
    "keyword_topk": "retrieval",
    "incremental_exact_dedup": "dedup",
    "connected_components": "dedup",
    "dedup_survivors": "dedup",
    "near_duplicate_pipeline": "dedup",
    # similarity / ANN
    "cosine_topk": "similarity",
    "quantized_dot_topk": "similarity",
    "ivf_train": "similarity",
    "ivf_topk": "similarity",
    "ivf_persist": "similarity",
    "ivf_probe_bucketed": "similarity",
    "ivf_append": "similarity",
    "lsh_near_duplicates": "similarity",
    "semantic_dedup": "similarity",
    "pq_train": "similarity",
    "pq_train_kmeans": "similarity",
    "pq_encode": "similarity",
    "pq_topk": "similarity",
    "pca_train": "similarity",
    "pca_project": "similarity",
    "hard_negatives": "similarity",
    "kcenter_sample": "similarity",
    "mmr_rerank": "similarity",
    "scalar_quantize": "similarity",
    # text analysis
    "tfidf_stats": "textanalysis",
    "tfidf_topk": "textanalysis",
    "lang_id": "textanalysis",
    "gopher_rules": "textanalysis",
    "c4_rules": "textanalysis",
    "decontaminate": "textanalysis",
    "contamination_report": "textanalysis",
    "scrub_pii": "textanalysis",
    "markdown_to_text": "textanalysis",
    "normalize_text": "textanalysis",
    "chunk_documents": "textanalysis",
    "bpe_train": "textanalysis",
    "bpe_segment": "textanalysis",
    "duplicate_span_stats": "textanalysis",
    "length_percentiles": "textanalysis",
    "vocab_profile": "textanalysis",
    # LM quality
    "lm_train": "lm",
    "lm_score": "lm",
    # sampling / mixing
    "hash_split": "sampling",
    "weighted_mix": "sampling",
    "temperature_weights": "sampling",
    "deterministic_shuffle": "sampling",
    "stratified_cap": "sampling",
    "grouped_topk": "sampling",
    "dsir_stats": "sampling",
    "split_leakage_report": "sampling",
    "leakage_safe_split": "sampling",
    "minhash_band_index": "dedup",
    "incremental_minhash_dedup": "dedup",
    "persist_minhash_band_index": "dedup",
    # packing
    "pack_by_budget": "packing",
    "materialize_packs": "packing",
    "with_global_index": "packing",
    "length_bucket_batches": "packing",
    "padding_waste": "packing",
    # events / time series
    "sessionize": "events",
    "funnel": "events",
    "cohort_retention": "events",
    "rolling_active_users": "events",
    "ewma_by_key": "events",
    # as-of / range / rollup
    "asof_join": "asof",
    "resample_carry_forward": "asof",
    "range_join": "rangejoin",
    "rollup_update": "rollup",
    # graph
    "pagerank": "graph",
    "bfs_levels": "graph",
    "shortest_paths": "graph",
    "triangle_count": "graph",
    # linkage
    "fuzzy_join": "linkage",
    "resolve_entities": "linkage",
    # warehouse
    "scd2_init": "scd",
    "scd2_apply": "scd",
    "scd2_as_of": "scd",
    "snapshot_diff": "scd",
    "evolve_schema": "evolve",
    "profile_table": "quality",
    "check_primary_key": "quality",
    "check_foreign_key": "quality",
    # sketches / bloom
    "cms_build": "sketches",
    "cms_estimate": "sketches",
    "hll_registers": "sketches",
    "hll_estimate": "sketches",
    "bloom_build": "bloom",
    "bloom_decontaminate": "bloom",
    "bloom_merge": "bloom",
    # ops over gaps / skew / corpus
    "find_gaps": "gaps",
    "plan_backfill": "gaps",
    "salted_join": "skew",
    "two_phase_agg": "skew",
    "prepare_training_corpus": "corpus",
    "corpus_profile": "corpus",
    "incremental_corpus_update": "corpus",
    "stream_corpus_admission": "corpus",
    # multimodal (real PNG/APNG/WAV codecs behind strict=True)
    "decode_images": "multimodal",
    "resize_images": "multimodal",
    "frame_sample": "multimodal",
    "image_dedup_pipeline": "multimodal",
    "image_hash_index": "multimodal",
    "persist_image_hash_index": "multimodal",
    "incremental_image_dedup": "multimodal",
    "stream_image_admission": "multimodal",
    "image_ahash": "multimodal",
    "image_metadata": "exif",
    "image_near_duplicates": "multimodal",
    "scrub_exif": "exif",
    "audio_features": "multimodal",
    "audio_metadata": "audiometa",
    "audio_fingerprint": "multimodal",
    "audio_near_duplicates": "multimodal",
    "audio_vad": "multimodal",
    "cdc_chunks": "cdc",
    "cdc_chunks_positional": "cdc",
    "chunk_dedup_stats": "cdc",
    "incremental_cdc_dedup": "cdc",
    "persist_chunk_index": "cdc",
    "stream_cdc_admission": "cdc",
    "csv_extract": "tabular",
    "pdf_to_text": "pdf",
    "code_stats": "sourcecode",
    "code_filter": "sourcecode",
    "license_tags": "sourcecode",
    "winnow_fingerprints": "sourcecode",
    "clone_pairs": "sourcecode",
    "ipynb_cells": "sourcecode",
    "notebook_to_text": "sourcecode",
    "explode_archives": "archive",
    "emails_to_rows": "mail",
    "subtitle_cues": "subtitles",
    "subtitle_stats": "subtitles",
    "document_extract": "extract",
    "align_cues_to_segments": "subtitles",
    "interval_overlap_join": "rangejoin",
    "synthetic_media": "multimodal",
    "decode_png": "png",
    "decode_jpeg": "jpeg",
    "decode_gif": "gif",
    "decode_tiff": "tiff",
    "decode_gif_frames": "gif",
    "decode_avi_frames": "avi",
    "encode_png": "png",
    "decode_apng_frames": "png",
    "decode_wav": "wav",
    "encode_wav": "wav",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module 'evm_archive_spark.operators' has no attribute {name!r}"
        )
    return getattr(importlib.import_module(f".{mod}", __name__), name)
