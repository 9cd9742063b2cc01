"""Tiny Hadoop-FileSystem helpers for index-maintenance operators
(tombstone tables + compaction swaps). JVM FileSystem API, not
os.path — works on any configured filesystem (local, HDFS, object
stores with a Hadoop connector), exactly like the streaming band
store's existence check (streaming/dedup_stream._path_exists)."""

from __future__ import annotations


def _fs(spark, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p, jvm


def path_exists(spark, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return fs.exists(p)


def delete_path(spark, path: str) -> None:
    fs, p, _ = _fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def replace_dir(spark, tmp_path: str, final_path: str) -> None:
    """Swap a freshly written directory into place: delete the old
    ``final_path`` (if any) and rename ``tmp_path`` onto it. The
    rename is atomic on HDFS/local; on object stores it's a copy —
    either way readers started BEFORE the swap hold the old file
    list, which is the standard compaction caveat (run maintenance
    without concurrent probes, or on a snapshot-isolating
    lakehouse)."""
    fs, tmp, jvm = _fs(spark, tmp_path)
    final = jvm.org.apache.hadoop.fs.Path(final_path)
    if fs.exists(final):
        fs.delete(final, True)
    if not fs.rename(tmp, final):
        raise IOError(f"rename {tmp_path} -> {final_path} failed")
