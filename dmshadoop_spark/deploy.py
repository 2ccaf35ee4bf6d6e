"""Cluster deployment: Spark-on-YARN + HDFS configuration.

The reference system ran MapReduce-era services over HDFS (WebHDFS I/O in
src/DMS.py, HBase/Solr on the same cluster); its Spark-era successor runs
this package's queries under YARN with HDFS (or any Hadoop-compatible FS)
as the table store. This module holds the production conf in code form so
the SAME query functions run unchanged from the local test rig to a
1000-executor cluster — only master/deploy-mode and the conf below differ
— and ships a ``spark-submit`` command builder for operators.

Sizing rationale (100 TB design point, 1000 executors x 4 cores):
  * dynamicAllocation + external shuffle service: executors scale with
    stage width; shuffle files outlive executor decommission (mandatory
    when AQE coalescing shrinks late stages).
  * shuffle.partitions ≈ 2-3x total cores: 8192 for 4000 cores keeps
    ~2 waves per reduce stage while staying above AQE's coalesce floor
    (AQE only merges DOWN, so over-partitioning is the safe direction).
  * maxPartitionBytes stays 128 MB → ~800k input splits at 100 TB; with
    4000 cores that is ~200 scan waves, amortizing scheduler overhead
    without starving dynamic allocation.
  * Kryo + off-heap: serialization dominates wide shuffles; off-heap
    keeps the executor heap small enough for sane GC pauses.

This is untestable in the single-JVM sandbox (no YARN RM), so the module
is import-pure and unit-tested at the string level; nothing else in the
package imports it at query time.
"""

from __future__ import annotations

from dmshadoop_spark.session import _SCALE_CONF

#: Conf shared by every deployment tier (the local test rig already uses
#: these via session.get_spark — see session._SCALE_CONF).
BASE_CONF: dict[str, str] = dict(_SCALE_CONF)

#: Production YARN overlay. Values are strings because that is what both
#: ``--conf`` and SparkConf accept verbatim.
YARN_CONF: dict[str, str] = {
    # -- resource shape -----------------------------------------------------
    "spark.executor.instances": "1000",  # ceiling; dynamicAllocation rules
    "spark.executor.cores": "4",
    "spark.executor.memory": "24g",
    "spark.executor.memoryOverhead": "4g",  # Arrow/pandas UDF workers live here
    "spark.memory.offHeap.enabled": "true",
    "spark.memory.offHeap.size": "8g",
    "spark.driver.memory": "16g",
    "spark.driver.maxResultSize": "4g",  # collect() is banned in hot paths anyway
    # -- elasticity ---------------------------------------------------------
    "spark.dynamicAllocation.enabled": "true",
    "spark.dynamicAllocation.minExecutors": "32",
    "spark.dynamicAllocation.maxExecutors": "1000",
    "spark.dynamicAllocation.executorIdleTimeout": "120s",
    "spark.shuffle.service.enabled": "true",  # shuffle outlives executors
    # -- shuffle sizing (2x 4000 cores; AQE coalesces down per stage) -------
    "spark.sql.shuffle.partitions": "8192",
    # -- serialization ------------------------------------------------------
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.kryoserializer.buffer.max": "256m",
    # -- fault tolerance at scale ------------------------------------------
    # Reliable checkpointing (functions/checkpoint.stabilize upgrades every
    # iterative operator once sc.setCheckpointDir is set): without the
    # cleaner, each Lloyd/propagation round leaves a full RDD copy in the
    # checkpoint dir — x2c alone writes up to ~27 per call — and a long
    # run fills the store (review finding). The cleaner deletes a
    # checkpoint's files when its RDD is GC'd on the driver, i.e. as the
    # iteration loop rebinds — exactly the lifecycle these loops have.
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
    "spark.stage.maxConsecutiveAttempts": "8",
    "spark.shuffle.io.maxRetries": "10",
    "spark.speculation": "true",  # tail-latency guard on 1000-node fleets
    "spark.speculation.quantile": "0.9",
    # -- event log for the history server ----------------------------------
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": "hdfs:///spark-logs",
}


def cluster_conf(
    executors: int = 1000,
    cores_per_executor: int = 4,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """BASE_CONF + YARN_CONF resized for a given fleet.

    shuffle.partitions scales at 2x total cores (the AQE-safe direction);
    executor ceiling and dynamicAllocation max follow ``executors``.
    """
    conf = dict(BASE_CONF)
    conf.update(YARN_CONF)
    total_cores = executors * cores_per_executor
    conf["spark.executor.instances"] = str(executors)
    conf["spark.executor.cores"] = str(cores_per_executor)
    conf["spark.dynamicAllocation.maxExecutors"] = str(executors)
    conf["spark.sql.shuffle.partitions"] = str(2 * total_cores)
    if extra:
        conf.update(extra)
    return conf


def spark_submit_command(
    app: str = "bench.py",
    queue: str = "default",
    executors: int = 1000,
    cores_per_executor: int = 4,
    archives: str | None = None,
    extra: dict[str, str] | None = None,
) -> list[str]:
    """Build the ``spark-submit`` argv for running this package on YARN.

    ``archives`` ships the Python env (e.g. ``pyspark_env.tar.gz#env`` via
    conda-pack/venv-pack) so executors resolve the same interpreter —
    the standard PySpark-on-YARN pattern. The package itself rides along
    as a zip via --py-files.
    """
    cmd = [
        "spark-submit",
        "--master", "yarn",
        "--deploy-mode", "cluster",
        "--queue", queue,
        "--py-files", "dmshadoop_spark.zip",
    ]
    if archives:
        cmd += ["--archives", archives]
        env_python = f"./{archives.rsplit('#', 1)[-1]}/bin/python"
        cmd += [
            "--conf",
            f"spark.yarn.appMasterEnv.PYSPARK_PYTHON={env_python}",
            "--conf",
            f"spark.executorEnv.PYSPARK_PYTHON={env_python}",
        ]
    for k, v in sorted(cluster_conf(executors, cores_per_executor, extra).items()):
        cmd += ["--conf", f"{k}={v}"]
    cmd.append(app)
    return cmd
