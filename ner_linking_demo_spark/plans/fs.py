"""Driver-side control-plane filesystem for the checkpoint catalog.

The catalog's data plane is always Spark readers/writers; what needs an
FS abstraction is the tiny control plane — publish renames, `_META.json`
markers, lineage rows. Round-2 advice flagged the streaming publisher
for doing this with ``os.replace`` (silently wrong for ``hdfs://`` /
``s3a://`` roots); this module generalizes that fix so the batch catalog
(plans/catalog.py) is scheme-correct too.

Two implementations behind one interface:

- ``LocalFS`` — bare paths (no scheme). Plain ``os`` calls; POSIX rename
  is atomic; lineage is a single append-only file.
- ``HadoopFS`` — any ``scheme://`` path (``file://``, ``hdfs://``,
  ``s3a://``, ...), resolved through ``org.apache.hadoop.fs.FileSystem``
  from the active Spark session's Hadoop configuration. HDFS directory
  rename is atomic; object-store rename is copy+delete (callers document
  that caveat). Appends don't exist on object stores, so lineage rows
  become one small uniquely-named file each under ``<path>.d/`` —
  read back merged in (ts, seq) order.

``file://`` intentionally routes to ``HadoopFS`` so the JVM code path is
exercisable in tests without a real cluster (tests/test_resume.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def catalog_fs(spark: SparkSession, root: str):
    """Pick the FS implementation by ``root``'s scheme."""
    if "://" in root:
        return HadoopFS(spark, root)
    return LocalFS()


class LocalFS:
    """POSIX control plane for bare local paths (the default backend)."""

    scheme = "local"

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def rename(self, src: str, dst: str) -> None:
        if os.path.exists(dst):
            raise IOError(f"publish target already exists: {dst}")
        os.rename(src, dst)  # atomic on POSIX, same filesystem

    def delete(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)

    def write_text(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def list_names(self, path: str) -> list[str]:
        return sorted(os.listdir(path)) if os.path.isdir(path) else []

    def file_sizes(self, path: str) -> dict[str, int]:
        return {
            n: os.path.getsize(os.path.join(path, n))
            for n in self.list_names(path)
            if os.path.isfile(os.path.join(path, n))
        }

    def local_path(self, path: str) -> str | None:
        """A plain-filesystem view of ``path`` if one exists (always,
        here) — lets callers use metadata-only local reads (parquet
        footers) instead of Spark jobs."""
        return path

    # lineage log: single append-only file (POSIX append is fine locally)
    def append_line(self, path: str, line: str) -> None:
        with open(path, "a") as f:
            f.write(line + "\n")

    def read_lines(self, path: str) -> list[str]:
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [ln for ln in f.read().splitlines() if ln.strip()]


class HadoopFS:
    """Control plane through ``org.apache.hadoop.fs.FileSystem`` — one
    code path for every Spark-reachable scheme. Driver-side only and
    metadata-sized I/O only; bulk data always moves through Spark."""

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        self.scheme = root.split("://", 1)[0]

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._Path(path))

    def rename(self, src: str, dst: str) -> None:
        if self._fs.exists(self._Path(dst)):
            raise IOError(f"publish target already exists: {dst}")
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise IOError(f"publish rename failed: {src} -> {dst}")

    def delete(self, path: str) -> None:
        self._fs.delete(self._Path(path), True)

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._Path(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._Path(path))
        baos = self._jvm.java.io.ByteArrayOutputStream()
        try:
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 4096, True
            )
        finally:
            baos.close()
        return bytes(baos.toByteArray()).decode("utf-8")

    def _statuses(self, path: str):
        if not self.exists(path):
            return []
        return list(self._fs.listStatus(self._Path(path)))

    def list_names(self, path: str) -> list[str]:
        return sorted(s.getPath().getName() for s in self._statuses(path))

    def file_sizes(self, path: str) -> dict[str, int]:
        return {
            s.getPath().getName(): int(s.getLen())
            for s in self._statuses(path)
            if s.isFile()
        }

    def local_path(self, path: str) -> str | None:
        if self.scheme == "file":
            return path[len("file://"):]
        return None

    # lineage log: append is unsupported on object stores, so each row is
    # its own immutable file under <path>.d/, named for stable ordering
    def append_line(self, path: str, line: str) -> None:
        d = path + ".d"
        self.mkdirs(d)
        n = len(self.list_names(d))
        self.write_text(f"{d}/{n:08d}.json", line)

    def read_lines(self, path: str) -> list[str]:
        d = path + ".d"
        return [self.read_text(f"{d}/{n}") for n in self.list_names(d)]
