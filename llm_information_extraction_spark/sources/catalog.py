"""Table catalog: Iceberg when the runtime jar is present, else
parquet + JSON manifest with the same snapshot/commit semantics.

The north rule materializes ``triples`` / ``entities`` / ``metrics`` /
``lineage`` into Iceberg tables and resumes from the last committed
snapshot. This sandbox has no Iceberg jar on the classpath, so the shim
detects availability at session build and falls back to a
parquet-directory layout with an atomically-written ``_manifest.json``
recording committed snapshots:

    <warehouse>/<table>/snap_<NNNN>/...parquet
    <warehouse>/<table>/_manifest.json   {"snapshots": [...], "current": k}

Readers always read the *current committed* snapshot, so a killed writer
(dead snapshot dir, manifest not updated) is invisible — exactly the
Iceberg commit contract the resume test relies on.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg SparkCatalog class is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[attr-defined]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


@dataclass
class Catalog:
    """Snapshot-committing table store (Iceberg-or-parquet)."""

    spark: SparkSession
    warehouse: str
    use_iceberg: bool | None = None
    _iceberg: bool = field(init=False)

    def __post_init__(self) -> None:
        os.makedirs(self.warehouse, exist_ok=True)
        self._iceberg = (
            iceberg_available(self.spark)
            if self.use_iceberg is None
            else self.use_iceberg
        )

    # -- manifest helpers (parquet fallback) -------------------------------
    def _manifest_path(self, table: str) -> Path:
        return Path(self.warehouse) / table / "_manifest.json"

    def _read_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not p.exists():
            return {"snapshots": [], "current": None}
        return json.loads(p.read_text())

    def _write_manifest(self, table: str, manifest: dict) -> None:
        p = self._manifest_path(table)
        p.parent.mkdir(parents=True, exist_ok=True)
        # atomic rename = the "commit" (same guarantee Iceberg's metadata
        # pointer swap provides)
        fd, tmp = tempfile.mkstemp(dir=str(p.parent), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, p)

    def _commit_meta(self, table: str, path: str, meta: dict | None) -> int:
        """Append + point the manifest at a new snapshot id (the commit)."""
        m = self._read_manifest(table)
        snap_id = (m["current"] + 1) if m["current"] is not None else 0
        m["snapshots"].append({"id": snap_id, "path": path, "meta": meta or {}})
        m["current"] = snap_id
        self._write_manifest(table, m)
        return snap_id

    # -- public API ---------------------------------------------------------
    def write(self, table: str, df: DataFrame, meta: dict | None = None) -> int:
        """Write a new snapshot of ``table``; returns the snapshot id.

        The snapshot only becomes visible once the manifest commit lands;
        a crash mid-write leaves the previous snapshot current. The
        Iceberg branch keeps the SAME side manifest for meta/snapshot-id
        bookkeeping (Iceberg holds the data, the manifest holds the
        pipeline's config fingerprints), so snapshot_meta()/exists() see
        one consistent view on both branches and resume works under
        Iceberg too. A crash between the Iceberg commit and the manifest
        commit re-runs the stage — the safe direction (idempotent
        createOrReplace).
        """
        if self._iceberg:
            df.writeTo(f"{table}").createOrReplace()
            return self._commit_meta(table, f"iceberg:{table}", meta)
        m = self._read_manifest(table)
        snap_id = (m["current"] + 1) if m["current"] is not None else 0
        path = str(Path(self.warehouse) / table / f"snap_{snap_id:06d}")
        df.write.mode("overwrite").parquet(path)
        self._commit_meta(table, path, meta)
        return snap_id

    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        if self._iceberg:
            if snapshot is not None:
                raise NotImplementedError(
                    "per-snapshot reads under Iceberg need time-travel "
                    "(VERSION AS OF); only the current table is wired"
                )
            return self.spark.table(table)
        m = self._read_manifest(table)
        sid = m["current"] if snapshot is None else snapshot
        if sid is None:
            raise FileNotFoundError(f"table {table!r} has no committed snapshot")
        snap = next(s for s in m["snapshots"] if s["id"] == sid)
        return self.spark.read.parquet(snap["path"])

    def exists(self, table: str) -> bool:
        if self._iceberg:
            # both the Iceberg table AND the manifest commit must exist —
            # a crash between them must read as "not committed"
            return (
                self.spark.catalog.tableExists(table)
                and self._read_manifest(table)["current"] is not None
            )
        return self._read_manifest(table)["current"] is not None

    def current_snapshot(self, table: str) -> int | None:
        return self._read_manifest(table)["current"]

    def snapshot_meta(self, table: str) -> dict:
        m = self._read_manifest(table)
        if m["current"] is None:
            return {}
        return next(s for s in m["snapshots"] if s["id"] == m["current"])["meta"]
