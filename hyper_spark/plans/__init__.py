from hyper_spark.plans.merge import (
    checkpointed_sketch_build,
    lineage_table,
    resume_info,
)

__all__ = ["checkpointed_sketch_build", "lineage_table", "resume_info"]
