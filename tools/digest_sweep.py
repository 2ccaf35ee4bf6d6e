"""Re-measure the rows-only pinned digests after a determinism-affecting
change. Usage: python tools/digest_sweep.py [qid ...] (default: the
kmeans/PQ-downstream set)."""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from dmshadoop_spark import registry

registry.load_all()
names = sys.argv[1:] or [
    "x5_knn_ivf",
    "x5_knn_ivf_trained",
    "x5_knn_pq",
    "x5_knn_ivfpq",
    "x5_pq_recall",
]
for n in names:
    rows = registry.QUERIES[n](spark, "/root/testdata/sf0.001").collect()
    ds = {r["digest"] for r in rows}
    assert len(ds) == 1, (n, ds)
    print(f"{n}: {ds.pop()}", flush=True)
spark.stop()
