from hyper_spark.streaming.hll_stream import streaming_sketch_by

__all__ = ["streaming_sketch_by"]
