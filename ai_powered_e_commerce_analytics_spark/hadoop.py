"""Shared Hadoop FileSystem access (used by sinks and pipeline archival).

One place for the py4j Path/FileSystem resolution so FS-handling fixes
apply everywhere at once. Always resolve the FS FROM THE PATH — the
default FS (``FileSystem.get(conf)``) rejects URIs of other schemes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_path(spark: SparkSession, path: str):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path(path)


def hadoop_fs(spark: SparkSession, path: str):
    """FileSystem serving ``path``'s scheme/authority."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return hadoop_path(spark, path).getFileSystem(conf)


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write ``text`` to ``path`` (overwrite) through the Hadoop FS API —
    works for any scheme the session can reach, unlike ``open()``."""
    fs = hadoop_fs(spark, path)
    out = fs.create(hadoop_path(spark, path), True)
    try:
        out.write(bytearray(text, "utf-8"))
    finally:
        out.close()


def fs_read_text(spark: SparkSession, path: str) -> str:
    """Read ``path`` fully as UTF-8 text through the Hadoop FS API."""
    jvm = spark.sparkContext._jvm
    fs = hadoop_fs(spark, path)
    stream = fs.open(hadoop_path(spark, path))
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def move_file(spark: SparkSession, src: str, dst: str) -> bool:
    """Move ``src`` to ``dst``, handling the cross-filesystem case:
    same-FS moves use rename (atomic); cross-FS moves (file:// source,
    hdfs:// archive, etc.) fall back to FileUtil.copy(deleteSource=True),
    since rename across filesystems throws 'Wrong FS'."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    src_p, dst_p = hadoop_path(spark, src), hadoop_path(spark, dst)
    src_fs = src_p.getFileSystem(conf)
    dst_fs = dst_p.getFileSystem(conf)
    if src_fs.getUri().equals(dst_fs.getUri()):
        return bool(src_fs.rename(src_p, dst_p))
    return bool(
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            src_fs, src_p, dst_fs, dst_p, True, conf
        )
    )
