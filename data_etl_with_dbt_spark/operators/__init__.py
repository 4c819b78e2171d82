from data_etl_with_dbt_spark.operators.relational import (  # noqa: F401
    additive_merge,
    apply_cdc,
    asof_join,
    auto_salted_join,
    fuzzy_pairs,
    global_row_index,
    per_key_cap,
    salted_agg,
    salted_join,
    skew_stats,
)
from data_etl_with_dbt_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    exact_duplicate_groups,
    minhash_lsh_pairs,
    ngram_df_prune,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    span_dedup,
)
from data_etl_with_dbt_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_similarity,
    embedding_near_dup_pairs,
    lsh_bucketed_topk,
)
from data_etl_with_dbt_spark.operators.textan import (  # noqa: F401
    doc_fingerprint,
    bpe_segment,
    gopher_quality_flags,
    lang_id_scores,
    mixture_sample,
    text_stats,
    token_count_bpe_ish,
    train_bpe,
    unigram_logprob_score,
)
from data_etl_with_dbt_spark.operators.sketch import (  # noqa: F401
    bloom_build,
    bloom_decontaminate,
    bloom_parameters,
    bloom_probe,
)
from data_etl_with_dbt_spark.operators.multimodal import (  # noqa: F401
    extract_media_features,
    media_from_binary_files,
    parse_mp3_meta,
    parse_mp4_meta,
    resize_image,
    resize_media,
    sample_frame_times,
    to_media_table,
)
from data_etl_with_dbt_spark.operators.graph import pagerank  # noqa: F401
