"""Sweep the reference's full golden-test suite (test/command/suite/**)
through the conformance runner and write a scoreboard.

Usage::

    PYTHONPATH=/root/repo python tools/conformance_sweep.py [dir ...]

With no args, sweeps every directory under the suite root.  Produces

- ``CONFORMANCE.json`` — per-fixture detail (pass/fail counts, skip
  reason, failing command snippets), plus per-directory totals;
- ``CONFORMANCE.md`` — human scoreboard table.

The sweep never counts an Unsupported script as a pass: fixtures are
bucketed pass / fail / skip(reason), and the scoreboard reports all
three so the parity claim is auditable fixture-by-fixture.
"""

from __future__ import annotations

import collections
import json
import glob
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUITE = os.environ.get(
    "GROONGA_SUITE", "/root/reference/test/command/suite"
)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fixtures(dirs: list[str]) -> list[str]:
    out = []
    for d in dirs:
        for tpath in sorted(
            glob.glob(f"{SUITE}/{d}/**/*.test", recursive=True)
        ):
            if os.path.exists(tpath[:-5] + ".expected"):
                out.append(tpath)
    return out


def main() -> None:
    from groonga_spark.conformance import Unsupported, run_fixture, parse_script
    from groonga_spark.session import get_spark

    dirs = sys.argv[1:] or sorted(
        os.path.basename(p.rstrip("/"))
        for p in glob.glob(f"{SUITE}/*/")
    )
    paths = fixtures(dirs)
    print(f"sweeping {len(paths)} fixtures from {len(dirs)} dirs", flush=True)

    spark = get_spark("conformance_sweep", cores=8, shuffle_partitions=8)
    work = "/tmp/conf_sweep_db"

    detail: dict[str, dict] = {}
    t0 = time.time()
    for i, tpath in enumerate(paths):
        rel = tpath[len(SUITE) + 1 : -5]
        with open(tpath) as f:
            test_text = f.read()
        try:
            parse_script(test_text)  # cheap pre-check: skip w/o Spark
        except Unsupported as e:
            detail[rel] = {"status": "skip", "reason": str(e)[:200]}
            continue
        except Exception as e:  # noqa: BLE001
            detail[rel] = {"status": "error", "reason": repr(e)[:200]}
            continue
        with open(tpath[:-5] + ".expected") as f:
            expected_text = f.read()
        t1 = time.time()
        try:
            results = run_fixture(
                spark, f"{work}/db{i}", test_text, expected_text
            )
        except Unsupported as e:
            detail[rel] = {"status": "skip", "reason": str(e)[:200]}
            continue
        except Exception as e:  # noqa: BLE001
            detail[rel] = {
                "status": "error",
                "reason": repr(e)[:300],
                "trace": traceback.format_exc().splitlines()[-3:],
            }
            continue
        n_pass = sum(1 for *_x, ok in results if ok)
        fails = [
            {"cmd": cmd[:120], "ours": repr(ours)[:200], "theirs": repr(theirs)[:200]}
            for cmd, ours, theirs, ok in results
            if not ok
        ]
        detail[rel] = {
            "status": "pass" if not fails and n_pass else
            ("fail" if fails else "empty"),
            "n_pass": n_pass,
            "n_fail": len(fails),
            "sec": round(time.time() - t1, 2),
            **({"fails": fails[:4]} if fails else {}),
        }
        if (i + 1) % 25 == 0:
            done = collections.Counter(v["status"] for v in detail.values())
            print(f"[{i+1}/{len(paths)}] {dict(done)} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # ---- aggregate per top-level dir -------------------------------
    per_dir: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for rel, v in detail.items():
        top = rel.split("/")[0]
        if top == "select":
            top = "/".join(rel.split("/")[:2])
        per_dir[top][v["status"]] += 1
    totals = collections.Counter(v["status"] for v in detail.values())

    out = {
        "totals": dict(totals),
        "n_fixtures": len(paths),
        "per_dir": {k: dict(v) for k, v in sorted(per_dir.items())},
        "detail": detail,
    }
    with open(f"{REPO}/CONFORMANCE.json", "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "# CONFORMANCE — reference golden-suite replay",
        "",
        "Replaying the reference's own `test/command/suite/**.test` scripts",
        "through `groonga_spark.conformance.run_fixture` and comparing every",
        "recorded response (`.expected`).  A fixture **passes** only if every",
        "compared response matches; **skip** = script uses features outside",
        "the engine's declared scope (reason recorded in CONFORMANCE.json).",
        "",
        f"Totals over {len(paths)} fixtures: "
        f"**{totals.get('pass',0)} pass**, {totals.get('fail',0)} fail, "
        f"{totals.get('error',0)} error, {totals.get('skip',0)} skip.",
        "",
        "| suite dir | pass | fail | error | skip |",
        "|---|---|---|---|---|",
    ]
    for top, c in sorted(per_dir.items()):
        lines.append(
            f"| {top} | {c.get('pass',0)} | {c.get('fail',0)} "
            f"| {c.get('error',0)} | {c.get('skip',0)} |"
        )
    lines.append("")
    skip_reasons = collections.Counter(
        v["reason"].split(":")[0][:60]
        for v in detail.values()
        if v["status"] == "skip"
    )
    lines.append("Top skip reasons:")
    lines.append("")
    for reason, n in skip_reasons.most_common(20):
        lines.append(f"- {n} × {reason}")
    lines.append("")
    with open(f"{REPO}/CONFORMANCE.md", "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"totals": dict(totals)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
