import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from dmshadoop_spark.session import get_spark

spark = get_spark(app_name="profile-x36")
spark.sparkContext.setLogLevel("ERROR")
from dmshadoop_spark.catalog import load_table
from dmshadoop_spark.functions.text import stopword_ratio, tokenize
from dmshadoop_spark.operators.logreg import (
    hashed_features,
    score_logreg,
    standardize,
    train_logreg,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


docs = load_table(spark, sf, "documents")
labels = docs.select(
    "doc_id", (stopword_ratio(tokenize("text")) >= 0.06).cast("int").alias("y")
)
raw = hashed_features(docs, dim=64).join(labels, "doc_id")
t("features+join count", lambda: raw.count())
feat0 = t("standardize (collect stats)", lambda: standardize(raw, "x", 64))[0]
feat = t("localCheckpoint", lambda: feat0.localCheckpoint(eager=True))
w_b = t("train 12 iters", lambda: train_logreg(feat, "y", "x", 64, 12, 4.0))
scored = score_logreg(feat, *w_b)
t("score+write", lambda: scored.write.format("noop").mode("overwrite").save())
spark.stop()
