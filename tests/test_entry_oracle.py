"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 on Spark AND its oracle_sql() on DuckDB, compare row count,
column names, and (order-insensitively) the values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


QUERY_NAMES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))

# Entries whose oracle equality rests on DuckDB's list_aggregate('sum')
# doing plain sequential left-to-right float64 addition (sign bits /
# thresholds sit on exact float equality).  Verified against the pinned
# version below; if a future DuckDB switches to pairwise/Kahan summation
# these xfail with a version message instead of masquerading as engine
# bugs.  (ADVICE r2: pin the version / add a fallback.)
DUCKDB_PINNED = "1.0"  # major.minor verified in this repo
FLOAT_EDGE = {"ann_lsh_topk", "lsh_neardup_q", "lsh_probe_q", "ivf_topk_q"}


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    try:
        assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
        assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
        ns, nd = _norm(srows, scols), _norm(drows, dcols)
        mismatches = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
        assert ns == nd, f"{name}: first mismatches {mismatches}"
    except AssertionError:
        ver = ".".join(duckdb.__version__.split(".")[:2])
        if name in FLOAT_EDGE and ver != DUCKDB_PINNED:
            pytest.xfail(
                f"{name}: float-edge oracle verified on DuckDB "
                f"{DUCKDB_PINNED}.x; running {duckdb.__version__} whose "
                "float summation order may differ"
            )
        raise


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
