import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from dmshadoop_spark import registry

registry.load_all()
df = registry.QUERIES[sys.argv[1] if len(sys.argv) > 1 else "x5_knn_sq8"](
    spark, "/root/testdata/sf0.01"
)
p = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
print(
    f"bcast:{'BroadcastExchange' in p} scans:{p.count('Scan parquet')} "
    f"py:{'Python' in p} wsc:{p.count('WholeStageCodegen')}",
    flush=True,
)
spark.stop()
