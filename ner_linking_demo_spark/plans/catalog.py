"""Checkpoint catalog: per-stage snapshot tables + lineage (north_rule
"every stage checkpoints to Iceberg with per-partition lineage and
counters so a killed run resumes without recomputation").

Two backends behind one API:
- **Iceberg** (``table_format='iceberg'``): uses ``df.writeTo(ns.table)``
  createOrReplace / append — snapshots, atomic replace and time travel come
  from the format. Requires the Iceberg Spark runtime on the classpath
  (see session.get_spark); this sandbox image does not ship it.
- **Parquet snapshots** (default): each write lands in
  ``<base>/<table>/snap-<n>/`` followed by an atomic pointer-file update
  (``<base>/<table>/LATEST``). Readers resolve LATEST -> snapshot dir; a
  killed writer leaves a dangling snap dir, never a corrupt table —
  the same write-once/atomic-publish discipline Iceberg gives
  (SURVEY.md §7 hard-part e: idempotent stage outputs under retries).

Lineage: every ``write`` appends a row to ``<base>/_lineage`` (stage,
snapshot, rows_out, n_partitions, per-partition row counts, wall_ms,
input signature). ``resume``: a stage whose (table, input signature)
already has a published snapshot is skipped and its output is read back —
kill/rerun does not recompute (tested in tests/test_resume.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointCatalog:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        table_format: str = "parquet",
        namespace: str = "kg",
    ):
        self.spark = spark
        self.base = base_dir.rstrip("/")
        self.fmt = table_format
        self.ns = namespace
        os.makedirs(self.base, exist_ok=True)

    # -- snapshot plumbing (parquet backend) --------------------------------
    def _tdir(self, table: str) -> str:
        return f"{self.base}/{table}"

    def _latest_path(self, table: str) -> str:
        return f"{self._tdir(table)}/LATEST"

    def _read_pointer(self, table: str) -> dict | None:
        p = self._latest_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def exists(self, table: str, input_sig: str | None = None) -> bool:
        ptr = self._read_pointer(table)
        if ptr is None:
            return False
        return input_sig is None or ptr.get("input_sig") == input_sig

    def read(self, table: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.table(f"{self.ns}.{table}")
        ptr = self._read_pointer(table)
        if ptr is None:
            raise FileNotFoundError(f"no published snapshot for {table}")
        return self.spark.read.parquet(f"{self._tdir(table)}/{ptr['snapshot']}")

    def write(
        self,
        df: DataFrame,
        table: str,
        stage: str | None = None,
        input_sig: str | None = None,
        partition_lineage: bool = True,
    ) -> DataFrame:
        """Materialize ``df`` as the new published snapshot of ``table``;
        returns the re-read DataFrame (truncated lineage). Counters are
        collected from the written files, not a second job over the input.
        """
        t0 = time.time()
        if self.fmt == "iceberg":
            df.writeTo(f"{self.ns}.{table}").createOrReplace()
            out = self.spark.read.table(f"{self.ns}.{table}")
            snap = "iceberg"
        else:
            ptr = self._read_pointer(table)
            n = (ptr["seq"] + 1) if ptr else 0
            snap = f"snap-{n:05d}"
            path = f"{self._tdir(table)}/{snap}"
            df.write.mode("overwrite").parquet(path)
            out = self.spark.read.parquet(path)
            tmp = self._latest_path(table) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"snapshot": snap, "seq": n, "input_sig": input_sig}, f
                )
            os.replace(tmp, self._latest_path(table))  # atomic publish

        # lineage counters from the published snapshot. Parquet path:
        # read the row counts out of the file FOOTERS (one output file per
        # write task = per-partition counts) — metadata-only, no Spark job.
        # The previous groupBy(spark_partition_id).count() re-scanned every
        # snapshot once per stage: an O(stage bytes) lineage tax that a
        # 100 TB run cannot pay.
        if partition_lineage and self.fmt != "iceberg":
            import pyarrow.parquet as pq

            files = sorted(
                fn for fn in os.listdir(path)
                if fn.endswith(".parquet") and not fn.startswith("_")
            )
            part_counts = {
                i: pq.ParquetFile(f"{path}/{fn}").metadata.num_rows
                for i, fn in enumerate(files)
            }
            rows_out = sum(part_counts.values())
        elif partition_lineage:
            per_part = (
                out.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            part_counts = {int(r["pid"]): int(r["count"]) for r in per_part}
            rows_out = sum(part_counts.values())
        else:
            part_counts = {}
            rows_out = out.count()
        self._log_lineage(
            {
                "stage": stage or table,
                "table": table,
                "snapshot": snap,
                "input_sig": input_sig,
                "rows_out": rows_out,
                "n_partitions": len(part_counts) or None,
                "partition_rows": part_counts,
                "wall_ms": int((time.time() - t0) * 1000),
                "ts": time.time(),
            }
        )
        return out

    def _log_lineage(self, row: dict) -> None:
        with open(f"{self.base}/_lineage", "a") as f:
            f.write(json.dumps(row) + "\n")

    def lineage(self) -> list[dict]:
        p = f"{self.base}/_lineage"
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- resume-aware stage runner ------------------------------------------
    def stage(self, table: str, input_sig: str, compute) -> DataFrame:
        """Run ``compute()`` unless a snapshot for (table, input_sig) is
        already published — the resume-without-recompute contract."""
        if self.exists(table, input_sig):
            self._log_lineage(
                {
                    "stage": table,
                    "table": table,
                    "resumed": True,
                    "input_sig": input_sig,
                    "ts": time.time(),
                }
            )
            return self.read(table)
        return self.write(compute(), table, stage=table, input_sig=input_sig)
