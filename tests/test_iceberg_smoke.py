"""Iceberg end-to-end smoke (skip-marked in this sandbox).

The sandbox has no iceberg-spark-runtime jar, so `IcebergTableStorage`
can only be contract-tested here (tests/test_storage_seam.py drives the
command surface through a fake catalog and pins the fail-fast).  THIS
module is the CI-style smoke that runs automatically the moment the jar
IS present — first cluster deploy should run exactly this file:

    # 1. put the runtime jar on the classpath (Spark 4.x / Scala 2.13):
    #    spark-submit --packages \
    #      org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 ...
    #    (or drop the jar in $SPARK_HOME/jars)
    # 2. configure a catalog, e.g. a local Hadoop catalog:
    #    spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog
    #    spark.sql.catalog.ice.type=hadoop
    #    spark.sql.catalog.ice.warehouse=/path/to/warehouse
    # 3. GS_ICEBERG_CATALOG=ice python -m pytest tests/test_iceberg_smoke.py

It proves the whole seam on the real backend: command-layer table IO,
index write/read round-trip, and query identity vs the in-memory index.
"""

import os

import pytest


def _iceberg_ready(spark) -> bool:
    cat = os.environ.get("GS_ICEBERG_CATALOG", "ice")
    impl = spark.conf.get(f"spark.sql.catalog.{cat}", None)
    if impl is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:
        return False


@pytest.fixture()
def ice_store(spark):
    if not _iceberg_ready(spark):
        pytest.skip(
            "no Iceberg catalog configured/loadable — set "
            "spark.sql.catalog.$GS_ICEBERG_CATALOG and put "
            "iceberg-spark-runtime on the classpath (see module docstring)"
        )
    from groonga_spark.storage import IcebergTableStorage

    cat = os.environ.get("GS_ICEBERG_CATALOG", "ice")
    ns = os.environ.get("GS_ICEBERG_NAMESPACE", "gs_smoke")
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.{ns}")
    store = IcebergTableStorage(spark, cat, namespace=ns)
    yield store
    for t in store.list_tables():
        store.drop(t)


def test_command_surface_on_iceberg(spark, tmp_path, ice_store):
    from groonga_spark.commands import CommandContext

    ctx = CommandContext(spark, str(tmp_path / "db"), storage=ice_store)
    ctx.table_create("t", "_key string, n long")
    ctx.load("t", [{"_key": "a", "n": 1}, {"_key": "b", "n": 2}])
    ctx.load("t", [{"_key": "a", "n": 9}])  # upsert commit
    ctx.delete("t", key="b")
    rows = {(r["_key"], r["n"]) for r in ctx.dump("t").collect()}
    assert rows == {("a", 9)}


def test_index_roundtrip_and_query_identity_on_iceberg(spark, tmp_path, ice_store):
    from groonga_spark import SearchEngine
    from groonga_spark.index.checkpoint import read_index, write_index

    docs = spark.createDataFrame(
        [(1, "merge sort tree"), (2, "merge heap"), (3, "other words")],
        "doc_id long, text string",
    )
    eng = SearchEngine.build(docs, ["text"], tokenizer="delimit")
    write_index(eng.index, str(tmp_path / "meta"), storage=ice_store)
    idx2 = read_index(spark, str(tmp_path / "meta"), storage=ice_store)
    a = [(r["doc_id"], round(r["score"], 9)) for r in eng.select("merge").collect()]
    b = [
        (r["doc_id"], round(r["score"], 9))
        for r in SearchEngine(idx2).select("merge").collect()
    ]
    assert a == b and len(a) == 2
