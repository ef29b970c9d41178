from hyper_spark.plans.merge import (
    checkpointed_sketch_build,
    lineage_table,
    resume_info,
)
from hyper_spark.plans.report import assert_plan, executed_plan, plan_report

__all__ = [
    "checkpointed_sketch_build",
    "lineage_table",
    "resume_info",
    "assert_plan",
    "executed_plan",
    "plan_report",
]
