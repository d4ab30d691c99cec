"""Table storage seam: the parquet-directory ↔ Iceberg substitution point.

The north star names an Iceberg source; this sandbox has no
iceberg-spark-runtime jar (verified: no catalog class on the classpath),
so the engine runs on plain parquet directories.  This module makes that
substitution a CODE SEAM instead of per-command commentary:

* :class:`TableStorage` — the minimal contract every table consumer in
  this repo needs: read / exists / create / overwrite (atomic full-table
  commit) / append / drop / rename / list / refresh.
* :class:`ParquetDirStorage` — the default: one directory per table,
  atomic replace via tmp-dir swap (write tmp → rm old → rename), Spark
  file-index invalidation on refresh.  This is what every test and the
  driver exercise.
* :class:`IcebergTableStorage` — the production implementation: the same
  contract expressed as Iceberg catalog operations (``spark.table``,
  ``writeTo(...).createOrReplace()``, ``DELETE``/``DROP``/``RENAME`` SQL).
  Constructing it verifies the catalog is actually loadable and raises a
  clear error otherwise, so the sandbox constraint is explicit at the
  seam rather than a silent fallback.

Consumers: :class:`~groonga_spark.commands.CommandContext` routes ALL its
table IO through a ``TableStorage`` (``load`` → overwrite commit, which an
Iceberg backend can instead express as MERGE INTO; ``delete`` → DELETE
WHERE; ``truncate`` → TRUNCATE); ``index/checkpoint.py``'s
``write_index``/``read_index`` take one for the three index tables.  The
checkpointed builder itself (stage waves, ``_SUCCESS`` markers, manifest)
and the footer-stats pruning in ``ordered.py`` stay parquet-specific by
design — they depend on the file-committer atomicity model and parquet
row-group metadata; their Iceberg analogues (snapshot isolation,
manifest-file min/max stats) are a different, equally-good mechanism the
engine would use through the same table reads.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _check_name(table: str) -> str:
    if not table.isidentifier():
        raise ValueError(f"bad table name {table!r}")
    return table


class TableStorage:
    """Contract for named-table IO.  All mutations are full-table commits
    (the command layer computes the post-state frame); implementations
    must make ``overwrite`` atomic with respect to concurrent readers."""

    def read(self, table: str) -> DataFrame:
        raise NotImplementedError

    def exists(self, table: str) -> bool:
        raise NotImplementedError

    def create(self, table: str, df: DataFrame) -> None:
        """Create ``table`` from ``df`` (caller guarantees non-existence)."""
        raise NotImplementedError

    def overwrite(
        self, table: str, df: DataFrame, partition_by: "list[str] | None" = None
    ) -> None:
        """Atomically replace the table's contents with ``df`` — the
        commit operation.  ``df`` may read from the table being replaced."""
        raise NotImplementedError

    def append(
        self, table: str, df: DataFrame, partition_by: "list[str] | None" = None
    ) -> None:
        raise NotImplementedError

    def drop(self, table: str) -> None:
        raise NotImplementedError

    def rename(self, table: str, new_name: str) -> None:
        raise NotImplementedError

    def list_tables(self) -> "list[str]":
        raise NotImplementedError

    def refresh(self, table: str) -> None:
        """Invalidate any engine-side metadata caches for ``table``."""
        raise NotImplementedError


class ParquetDirStorage(TableStorage):
    """One parquet directory per table under ``root``.

    ``overwrite`` commits via tmp-dir swap: the replacement frame (which
    usually READS the table being replaced) is fully materialized to
    ``<table>.tmp`` first, then the old directory is removed and the tmp
    renamed in — a reader either lists the old files or the new ones.
    ``refresh`` drops Spark's cached InMemoryFileIndex for the path (the
    same directory now holds different part files)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, _check_name(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def create(self, table: str, df: DataFrame) -> None:
        self.overwrite(table, df)

    def overwrite(
        self, table: str, df: DataFrame, partition_by: "list[str] | None" = None
    ) -> None:
        # tmp-then-rename unconditionally: a mid-write failure on a
        # FIRST write must not leave a partial directory that exists()
        # then reports as a real table (the atomic-commit contract
        # covers creates, not just replaces)
        path = self.path(table)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    def append(
        self, table: str, df: DataFrame, partition_by: "list[str] | None" = None
    ) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table))

    def rename(self, table: str, new_name: str) -> None:
        dst = self.path(new_name)
        if os.path.exists(dst):
            raise ValueError(f"table {new_name!r} exists")
        os.rename(self.path(table), dst)

    def list_tables(self) -> "list[str]":
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
            and not d.endswith(".tmp")
        )

    def refresh(self, table: str) -> None:
        self.spark.catalog.refreshByPath(self.path(table))


class IcebergTableStorage(TableStorage):
    """The production backend: tables live in an Iceberg catalog
    ``<catalog>.<namespace>``.  Commits ride Iceberg's snapshot isolation
    (no tmp-dir swap needed); ``load --ifexists``-style upserts could
    further specialize to MERGE INTO, and ``delete`` to DELETE WHERE —
    both are row-level commits the :class:`TableStorage` overwrite
    contract subsumes.

    Requires iceberg-spark-runtime on the Spark classpath and a
    configured catalog (spark.sql.catalog.<name>).  This sandbox ships
    neither, so construction fails fast with the reason — the seam makes
    the environment constraint explicit instead of silently reading
    parquet."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "db"):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if impl is None:
            raise RuntimeError(
                f"no Spark catalog {catalog!r} configured — set "
                f"spark.sql.catalog.{catalog}=org.apache.iceberg.spark."
                "SparkCatalog and put iceberg-spark-runtime on the "
                "classpath (absent in this sandbox)"
            )
        try:
            spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        except Exception as e:  # pragma: no cover - jar-present path
            raise RuntimeError(
                f"catalog class {impl!r} not loadable: {e}"
            ) from None

    def _fq(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{_check_name(table)}"

    def read(self, table: str) -> DataFrame:
        return self.spark.table(self._fq(table))

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._fq(table))

    def create(self, table: str, df: DataFrame) -> None:
        df.writeTo(self._fq(table)).create()

    def overwrite(
        self, table: str, df: DataFrame, partition_by: "list[str] | None" = None
    ) -> None:
        w = df.writeTo(self._fq(table))
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()

    def append(
        self, table: str, df: DataFrame, partition_by: "list[str] | None" = None
    ) -> None:
        df.writeTo(self._fq(table)).append()

    def drop(self, table: str) -> None:
        self.spark.sql(f"DROP TABLE {self._fq(table)}")

    def rename(self, table: str, new_name: str) -> None:
        self.spark.sql(
            f"ALTER TABLE {self._fq(table)} RENAME TO "
            f"{self.catalog}.{self.namespace}.{_check_name(new_name)}"
        )

    def list_tables(self) -> "list[str]":
        return sorted(
            t.name
            for t in self.spark.catalog.listTables(
                f"{self.catalog}.{self.namespace}"
            )
        )

    def refresh(self, table: str) -> None:
        self.spark.catalog.refreshTable(self._fq(table))
