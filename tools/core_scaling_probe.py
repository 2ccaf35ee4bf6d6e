"""Core-scaling probe (r12 verdict task 2): widened lanes at sf1,
low vs high core count, with the JVM's actual parallelism stamped."""
import json
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dmshadoop_spark import registry
from dmshadoop_spark.session import get_spark
registry.load_all()
spark = get_spark(app_name="core-scaling")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1_r13")
lanes = ["a6_q1_pricing_summary", "x36_quality_classifier", "x35b_semdedup_autok"]
out = {}
for name in lanes:
    fn = registry.QUERIES[name]
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    out[name] = {"best": min(ts), "passes": ts}
print(json.dumps({
    "sf_dir": sf,
    "spark_master": spark.sparkContext.master,
    "default_parallelism": spark.sparkContext.defaultParallelism,
    "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
    "lanes": out,
}), flush=True)
spark.stop()
