"""connected_components (alternating large-star/small-star) and the
minhash_cc dedup method built on it."""

from pyspark.sql import functions as F

from groonga_spark.ops.dedup import connected_components, dedup_documents


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    rows = connected_components(df).collect()
    return {r["id"]: r["component"] for r in rows}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges(spark):
    # a path graph is the worst case for naive min-label propagation
    # (O(diameter) rounds); star rounds collapse it in O(log² n)
    n = 64
    got = _cc(spark, [(i, i + 1) for i in range(1, n)])
    assert got == {i: 1 for i in range(1, n + 1)}


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (5, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_dedup_minhash_cc_chain(spark):
    # doc3 is a near-dup of BOTH doc1 and doc2 (J = 0.368 each, verified
    # offline that the double-hashed band minima collide so LSH proposes
    # both pairs) while doc1 vs doc2 share nothing.  Greedy-by-id drops
    # only doc3 (keeps {1, 2}); transitive-closure clustering merges
    # {1, 2, 3} into one component and keeps only its min, doc1.
    u = [f"x0{i}" for i in range(12)]
    v = [f"y0{i}" for i in range(12)]
    df = spark.createDataFrame(
        [
            (1, " ".join(u)),
            (2, " ".join(v)),
            (3, " ".join(u[:9] + v[:9])),
        ],
        "doc_id long, text string",
    )
    greedy = dedup_documents(
        df, method="minhash", threshold=0.3, k=3, n_bands=4, r=1
    )
    cc = dedup_documents(
        df, method="minhash_cc", threshold=0.3, k=3, n_bands=4, r=1
    )
    assert sorted(r["doc_id"] for r in greedy.collect()) == [1, 2]
    assert sorted(r["doc_id"] for r in cc.collect()) == [1]


def test_cc_components_are_min_ids(spark):
    got = _cc(spark, [(7, 3), (3, 9), (20, 15), (15, 25), (2, 9)])
    comps = {}
    for node, comp in got.items():
        comps.setdefault(comp, set()).add(node)
    assert set(comps) == {2, 15}
    assert comps[2] == {2, 3, 7, 9}
    assert comps[15] == {15, 20, 25}
