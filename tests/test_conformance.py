"""Replay the reference's own golden command scripts
(test/command/suite/**.test / .expected) through the conformance runner
and require every supported select to match the reference's recorded
response — the direct "matches the reference's results on its own test
queries" gate.

The fixtures are read from the reference checkout; when it is absent
(standalone deployments of this repo) the tests skip.  Scripts using
commands/types outside the supported subset raise
:class:`~groonga_spark.conformance.Unsupported` and are reported as
skipped, never silently counted as passing.
"""

import glob
import os

import pytest

SUITE = "/root/reference/test/command/suite"

# directories swept; each entry is (glob under SUITE,)
DIRS = [
    "select/query",
    # geo selector semantics (index-only errors, corner validation,
    # mesh-walk emission order, --each, vector geo load)
    "select/filter/geo_in_circle/column",
    "select/filter/geo_in_rectangle/invalid",
    "select/output/geo_point",
    "load/each",
    "load/index/online/vector",
    "geo",
    # suggest dataset: learner + complete/correct/suggest
    "suggest",
    # OR scan-info rotation + slot-reuse ordering, plugin_unregister
    "plugin_register",
    "plugin_unregister",
    "select/query_expander/proc",
    # jsonp URL command form, request_cancel, NFKC51 aliasing,
    # UInt64-beyond-Int64 inverse error
    "response",
    "request_cancel",
    "table_create/normalizer",
    "truncate/table",
    "select/filter/arithmetic_operation/unary_minus",
    # grn partial-qsort order on an index-column sort; untokenized-
    # lexicon prefix escalation through a vector-reference index
    "select/sort",
    "table_create/default_tokenizer",
    # _resync (row-mirror rewrite after in-place mutations) goes through
    # the storage seam; the r4 seam refactor broke these 13 fixtures'
    # shared path (ctx._path -> storage.exists) and the subset missed it
    "column_rename",
    "delete/reference/cross",
    "truncate/column",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SUITE), reason="reference fixture suite not available"
)


def _fixtures():
    out = []
    for d in DIRS:
        for tpath in sorted(glob.glob(f"{SUITE}/{d}/**/*.test", recursive=True)):
            if os.path.exists(tpath[:-5] + ".expected"):
                out.append(tpath)
    return out


def test_reference_suite(spark, tmp_path):
    from groonga_spark.conformance import Unsupported, run_fixture

    failures, skipped, n_pass = [], [], 0
    for i, tpath in enumerate(_fixtures()):
        rel = tpath[len(SUITE) + 1 : -5]
        with open(tpath) as f:
            test_text = f.read()
        with open(tpath[:-5] + ".expected") as f:
            expected_text = f.read()
        try:
            results = run_fixture(
                spark, str(tmp_path / f"db{i}"), test_text, expected_text
            )
        except Unsupported as e:
            skipped.append(f"{rel}: {e}")
            continue
        for cmd, ours, theirs, ok in results:
            if ok:
                n_pass += 1
            else:
                failures.append(f"{rel} | {cmd[:90]}\n  ours:   {ours}\n  theirs: {theirs}")
    assert n_pass > 0
    assert not failures, (
        f"{len(failures)} select(s) diverge from the reference "
        f"({n_pass} pass, {len(skipped)} scripts unsupported):\n"
        + "\n".join(failures)
    )
