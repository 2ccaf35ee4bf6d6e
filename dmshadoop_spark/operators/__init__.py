from dmshadoop_spark.operators.asof import asof_join
from dmshadoop_spark.operators.skew import salted_agg, salted_join

__all__ = ["asof_join", "salted_agg", "salted_join"]
