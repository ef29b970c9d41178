from hyper_spark.streaming.dedup_stream import streaming_dedup
from hyper_spark.streaming.topk_stream import streaming_windowed_topk
from hyper_spark.streaming.quantiles_window_stream import streaming_windowed_quantiles
from hyper_spark.streaming.sessionize_stream import streaming_sessionize
from hyper_spark.streaming.transitions_stream import streaming_transitions
from hyper_spark.streaming.dd_stream import (
    streaming_windowed_dd_by,
    windowed_dd_quantiles,
)
from hyper_spark.streaming.decay_stream import (
    streaming_windowed_decay_by,
    windowed_decayed_counts,
    windowed_decayed_topk,
)
from hyper_spark.streaming.sliding_theta_stream import (
    streaming_sliding_theta_entries,
)
from hyper_spark.streaming.sliding_tuple_stream import (
    streaming_sliding_tuple_entries,
)
from hyper_spark.streaming.sliding_moments_stream import (
    streaming_sliding_moments,
)
from hyper_spark.streaming.sliding_cms_stream import (
    streaming_sliding_cms_cells,
)
from hyper_spark.streaming.cs_stream import streaming_cs_cells
from hyper_spark.streaming.sliding_hll_stream import (
    streaming_sliding_register_by,
)
from hyper_spark.streaming.burn_stream import streaming_bucket_counts
from hyper_spark.streaming.hll_stream import (
    streaming_cms_by,
    streaming_quantiles_by,
    streaming_sketch_by,
    streaming_theta_by,
    streaming_windowed_sketch_by,
)

__all__ = [
    "streaming_bucket_counts",
    "streaming_sketch_by",
    "streaming_theta_by",
    "streaming_cms_by",
    "streaming_quantiles_by",
    "streaming_windowed_sketch_by",
    "streaming_sessionize",
    "streaming_transitions",
    "streaming_dedup",
    "streaming_windowed_topk",
    "streaming_windowed_quantiles",
    "streaming_windowed_dd_by",
    "windowed_dd_quantiles",
    "streaming_windowed_decay_by",
    "windowed_decayed_counts",
    "windowed_decayed_topk",
    "streaming_sliding_register_by",
    "streaming_sliding_cms_cells",
    "streaming_cs_cells",
    "streaming_sliding_moments",
    "streaming_sliding_theta_entries",
    "streaming_sliding_tuple_entries",
]
