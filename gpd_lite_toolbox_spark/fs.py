"""Filesystem probes that respect Spark's Hadoop configuration.

Driver-side ``os.path`` checks only see the driver's local disk; an
index legitimately committed to remote storage (``s3a://``,
``hdfs://``, ``abfss://``) would look absent and flip a fail-open /
fail-closed decision the wrong way (round-6 ADVICE).  Resolving
through ``FileSystem.get(uri, hadoopConf)`` gives the same answer the
executors' readers will get, for every scheme the cluster can mount,
while still behaving identically for plain local paths in tests.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def success_marker_exists(spark: SparkSession, dir_path: str) -> bool:
    """True iff ``dir_path/_SUCCESS`` exists on whatever filesystem
    ``dir_path``'s scheme names (local, HDFS, S3A, ...), resolved via
    Hadoop's FileSystem API so remote-committed writes are recognised.

    Falls back to a driver-local ``os.path`` probe only if the JVM
    gateway is unreachable (never the case under a live session — kept
    so unit code paths without a JVM still work for ``file:``/bare
    paths)."""
    marker = dir_path.rstrip("/") + "/_SUCCESS"
    try:
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        hconf = jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(marker)
        fs = path.getFileSystem(hconf)
        return bool(fs.exists(path))
    except Exception:
        import os

        local = marker[len("file:") :] if marker.startswith("file:") else marker
        return os.path.exists(local)
