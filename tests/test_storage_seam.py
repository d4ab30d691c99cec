"""The parquet↔Iceberg storage seam (groonga_spark/storage.py): every
CommandContext table operation must route through the TableStorage
contract — proven by running the command surface against a FAKE catalog
storage (in-memory, no filesystem paths at all), mirroring how an
Iceberg catalog would plug in.  Also pins the sandbox constraint:
constructing IcebergTableStorage without a configured catalog fails
fast with a clear message instead of silently reading parquet."""

import pytest

from groonga_spark.storage import ParquetDirStorage, TableStorage


class FakeCatalogStorage(TableStorage):
    """In-memory catalog: tables are (schema, rows) snapshots.  overwrite
    materializes the frame BEFORE replacing state, which is exactly the
    snapshot-commit semantics an Iceberg backend provides (and what the
    parquet backend's tmp-dir swap emulates)."""

    def __init__(self, spark):
        self.spark = spark
        self.tables = {}
        self.refreshed = []

    def read(self, table):
        schema, rows = self.tables[table]
        return self.spark.createDataFrame(rows, schema)

    def exists(self, table):
        return table in self.tables

    def create(self, table, df):
        self.tables[table] = (df.schema, df.collect())

    def overwrite(self, table, df, partition_by=None):
        snapshot = df.collect()  # materialize before replacing (self-reads)
        self.tables[table] = (df.schema, snapshot)

    def append(self, table, df, partition_by=None):
        schema, rows = self.tables.get(table, (df.schema, []))
        self.tables[table] = (schema, rows + df.collect())

    def drop(self, table):
        del self.tables[table]

    def rename(self, table, new_name):
        if new_name in self.tables:
            raise ValueError(f"table {new_name!r} exists")
        self.tables[new_name] = self.tables.pop(table)

    def list_tables(self):
        return sorted(self.tables)

    def refresh(self, table):
        self.refreshed.append(table)


@pytest.fixture()
def ctx(spark, tmp_path):
    from groonga_spark.commands import CommandContext

    return CommandContext(spark, str(tmp_path), storage=FakeCatalogStorage(spark))


ROWS = [
    {"_key": "a", "text": "alpha beta", "n": 1},
    {"_key": "b", "text": "gamma", "n": 2},
    {"_key": "c", "text": "delta", "n": 3},
]


def test_commands_run_on_fake_catalog(ctx):
    # load creates the table through the seam — no filesystem involved
    assert ctx.load("t", ROWS) == 3
    assert ctx.table_list() == ["t"]
    assert ctx.dump("t").count() == 3

    # upsert by key (ifexists): replaced, not duplicated
    assert ctx.load("t", [{"_key": "b", "text": "GAMMA", "n": 9}]) == 1
    got = {r["_key"]: r["n"] for r in ctx.dump("t").collect()}
    assert got == {"a": 1, "b": 9, "c": 3}

    # ifexists=False: only unseen keys append
    assert ctx.load("t", [{"_key": "b", "n": 0}, {"_key": "d", "n": 4}],
                    ifexists=False) == 1
    assert ctx.dump("t").count() == 4

    # delete by key and by filter
    assert ctx.delete("t", key="d") == 1
    assert ctx.delete("t", filter="n >= 9") == 1
    assert sorted(r["_key"] for r in ctx.dump("t").collect()) == ["a", "c"]

    # schema evolution + rename + truncate + remove, all via the seam
    ctx.column_create("t", "lang", "string", default="en")
    assert ("lang", "string") in ctx.column_list("t")
    ctx.table_rename("t", "u")
    assert ctx.table_list() == ["u"]
    ctx.truncate("u")
    assert ctx.dump("u").count() == 0
    assert ctx.column_list("u")  # schema survives truncate
    ctx.table_remove("u")
    assert ctx.table_list() == []


def test_table_create_conflict_and_refresh(ctx):
    ctx.table_create("t", "_key string, v long")
    with pytest.raises(ValueError):
        ctx.table_create("t")
    # mutations must hit storage.refresh (cache invalidation contract)
    ctx.load("t", [{"_key": "x", "v": 1}])
    assert "t" in ctx.storage.refreshed


def test_index_roundtrip_through_fake_storage(spark, tmp_path):
    # write_index/read_index route the three index tables through the
    # seam; stats.json stays a driver-side metadata file
    from groonga_spark import SearchEngine
    from groonga_spark.index.checkpoint import read_index, write_index

    docs = spark.createDataFrame(
        [(1, "merge sort tree"), (2, "merge heap"), (3, "other words")],
        "doc_id long, text string",
    )
    eng = SearchEngine.build(docs, ["text"], tokenizer="delimit")
    store = FakeCatalogStorage(spark)
    write_index(eng.index, str(tmp_path / "idx"), storage=store)
    assert set(store.tables) == {"dictionary", "postings", "doclens"}
    idx2 = read_index(spark, str(tmp_path / "idx"), storage=store)
    assert idx2.stats.n_docs == 3
    assert (
        idx2.dictionary.count() == eng.index.dictionary.count()
    )
    # and the reloaded index answers queries identically
    from groonga_spark.query.engine import SearchEngine as SE

    e2 = SE(idx2)
    got = [r["doc_id"] for r in e2.select("merge", escalate=False).collect()]
    want = [r["doc_id"] for r in eng.select("merge", escalate=False).collect()]
    assert got == want


def test_parquet_storage_matches_fake(spark, tmp_path):
    # the default backend behaves identically on the same command script
    from groonga_spark.commands import CommandContext

    a = CommandContext(spark, str(tmp_path / "pq"))
    b = CommandContext(spark, str(tmp_path / "fake"),
                       storage=FakeCatalogStorage(spark))
    for ctx in (a, b):
        ctx.load("t", ROWS)
        ctx.delete("t", key="b")
        ctx.column_create("t", "flag", "long", default=7)
    ra = sorted(tuple(r) for r in a.dump("t").select("_key", "n", "flag").collect())
    rb = sorted(tuple(r) for r in b.dump("t").select("_key", "n", "flag").collect())
    assert ra == rb
    assert isinstance(a.storage, ParquetDirStorage)


def test_iceberg_storage_fails_fast_without_catalog(spark):
    from groonga_spark.storage import IcebergTableStorage

    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergTableStorage(spark, "ice")
