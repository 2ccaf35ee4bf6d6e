import sys, time, json, os
sys.path.insert(0, "/root/repo")
from dmshadoop_spark import registry
from dmshadoop_spark.session import get_spark

registry.load_all()
spark = get_spark(app_name="sweep-all")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"
out = {}
for name, fn in registry.QUERIES.items():
    t0 = time.perf_counter()
    try:
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    except Exception as e:
        out[name] = f"ERR {type(e).__name__}"
    print(name, out[name], flush=True)
json.dump(out, open("/tmp/sweep_all.json", "w"))
spark.stop()
