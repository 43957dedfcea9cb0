"""Composite operators the engine adds on top of Spark built-ins.

Each operator is a pure ``DataFrame -> DataFrame`` function (the
reference's processor contract, `base_processor.py:39-51`, without the
class ceremony) designed around one-shuffle plans that survive scale.
"""

from local_stream_stack_spark.operators.quality import (
    expectations_report,
)
from local_stream_stack_spark.operators.quantiles import (
    exact_quantile,
    exact_quantiles,
    exact_quantiles_by_value,
    exact_quantiles_multi,
)
from local_stream_stack_spark.operators.events import (
    latest_per_key,
    asof_join,
    sessionize,
)
from local_stream_stack_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash64,
    ngram_jaccard_pairs,
)
from local_stream_stack_spark.operators.similarity import (
    with_vector_norm,
    cosine_topk_bruteforce,
    lsh_bucket_topk,
)
from local_stream_stack_spark.operators.clustering import (
    kmeans_lloyd_quantized,
    kmeans_lloyd_grouped,
    quantize_vectors,
    quantize_vectors_normalized,
)
from local_stream_stack_spark.operators.text import (
    with_text_stats,
    lang_id_scores,
)
from local_stream_stack_spark.operators.joins import (
    salted_join,
    write_bucketed,
)
from local_stream_stack_spark.operators.partitioning import (
    spread_narrow_input,
)

__all__ = [
    "expectations_report",
    "exact_quantile",
    "exact_quantiles",
    "exact_quantiles_by_value",
    "exact_quantiles_multi",
    "salted_join",
    "write_bucketed",
    "spread_narrow_input",
    "latest_per_key",
    "asof_join",
    "sessionize",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash64",
    "ngram_jaccard_pairs",
    "with_vector_norm",
    "cosine_topk_bruteforce",
    "lsh_bucket_topk",
    "kmeans_lloyd_quantized",
    "kmeans_lloyd_grouped",
    "quantize_vectors",
    "quantize_vectors_normalized",
    "with_text_stats",
    "lang_id_scores",
]
