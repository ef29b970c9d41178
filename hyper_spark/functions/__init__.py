"""Native Column-expression builders (JVM-side, whole-stage-codegen).

Nothing in this package crosses into Python per row: every function
returns ``pyspark.sql.Column`` trees built from built-in functions.
"""

from hyper_spark.functions.hashing import hll_index_col, hll_rho_col, hll_prepare

__all__ = ["hll_index_col", "hll_rho_col", "hll_prepare"]
