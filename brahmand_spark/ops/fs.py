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
    """Swap a freshly written directory into place, crash-safely:
    rename the live dir ASIDE (``<final>.old``), rename ``tmp_path``
    onto the live name, then delete the aside copy. A crash at any
    point leaves a recoverable directory on disk — either the old
    table (aside, or still live) or the new one — never neither
    (r9 review: the previous delete-then-rename had a window with NO
    live table and only an internally named tmp dir). A stale aside
    from a prior crash is cleared first. Renames are atomic on
    HDFS/local; on object stores they're copies — either way readers
    started BEFORE the swap hold the old file list, which is the
    standard compaction caveat (run maintenance without concurrent
    probes, or on a snapshot-isolating lakehouse)."""
    fs, tmp, jvm = _fs(spark, tmp_path)
    final = jvm.org.apache.hadoop.fs.Path(final_path)
    aside = jvm.org.apache.hadoop.fs.Path(final_path + ".old")
    if fs.exists(aside):
        fs.delete(aside, True)
    had_old = fs.exists(final)
    if had_old and not fs.rename(final, aside):
        raise IOError(f"rename {final_path} -> {final_path}.old failed")
    if not fs.rename(tmp, final):
        raise IOError(f"rename {tmp_path} -> {final_path} failed")
    if had_old:
        fs.delete(aside, True)
