import json
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

master = sys.argv[1] if len(sys.argv) > 1 else "local[8]"
shuf = sys.argv[2] if len(sys.argv) > 2 else "8"
spark = (
    SparkSession.builder.master(master)
    .config("spark.sql.shuffle.partitions", shuf)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from dmshadoop_spark import registry

registry.load_all()
rows = registry.QUERIES["x6_jpeg_roundtrip"](
    spark, "/root/testdata/sf0.001"
).collect()
out = {
    r["path"]: [r["thumb_w"], r["thumb_h"], r["pixel_sha256"]] for r in rows
}
print(json.dumps({"digest": rows[0]["digest"], "rows": out}, sort_keys=True))
spark.stop()
