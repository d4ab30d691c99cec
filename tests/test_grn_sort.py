"""_grn_sort_value: exact replay of grn_table_sort_value's partial
quicksort (reference lib/db.c:10184-10271) — pure function, no Spark.

The tie ORDER among equal sort values is implementation-defined by the
pack/part swap sequence, and the reference's goldens record it
(select/sort/index).  These tests pin the exact fixture outcome plus the
invariants that hold for any input.
"""

from groonga_spark.conformance import _grn_sort_value


def test_select_sort_index_fixture_order():
    # the Terms lexicon of select/sort/index: (id, posting-count) in pat
    # cursor (key byte) order; sort DESC by count, offset 0 limit 10
    cursor = [
        (6, 10),   # .
        (2, 6),    # :
        (11, 1),   # argument
        (7, 1),    # critical
        (8, 1),    # disk
        (1, 4),    # error
        (5, 1),    # file
        (9, 1),    # full
        (10, 1),   # invalid
        (3, 1),    # no
        (4, 1),    # such
    ]
    entries = [(i, -v) for i, v in cursor]  # DESC = negated values
    order = _grn_sort_value(entries, 0, 10)
    assert order[:10] == [6, 2, 1, 7, 11, 8, 5, 3, 10, 9]


def test_distinct_values_fully_sorted():
    # distinct values: scramble can't show; any window is plain order
    entries = [(i, v) for i, v in zip(range(20), [7, 3, 11, 0, 19, 5,
                                                  2, 17, 13, 1, 8, 4,
                                                  16, 9, 6, 18, 10, 12,
                                                  15, 14])]
    order = _grn_sort_value(entries, 0, 20)
    assert [e[1] for e in sorted(entries, key=lambda e: e[1])] == [
        dict(entries)[i] for i in order
    ]


def test_partial_window_matches_full_sort():
    # [offset, offset+limit) must hold the same IDS as a full sort's
    # window even though elements outside it may stay unsorted
    entries = [(i, (i * 7919) % 23) for i in range(40)]
    full = _grn_sort_value(entries, 0, 40)
    for offset, limit in ((0, 5), (3, 7), (10, 10), (30, 10)):
        part = _grn_sort_value(list(entries), offset, limit)
        assert part[offset:offset + limit] == full[offset:offset + limit]


def test_small_inputs():
    assert _grn_sort_value([], 0, 10) == []
    assert _grn_sort_value([(1, 5)], 0, 10) == [1]
    assert _grn_sort_value([(1, 5), (2, 3)], 0, 10) == [2, 1]
    assert _grn_sort_value([(1, 3), (2, 5)], 0, 10) == [1, 2]
