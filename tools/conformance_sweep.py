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

``--resume`` reloads CONFORMANCE.json and re-runs only fixtures whose
recorded status is NOT pass (error/fail/skip, or no record) — skips
re-run because a skip may have become supported; rows outside the swept
dirs are kept verbatim.  The cheap way to recover a sweep whose JVM
died mid-run, or to recheck one directory.  The runner also recycles the SparkSession every
``RECYCLE_EVERY`` fixtures (a 1200+-fixture sweep accretes JVM state —
the round-2 full sweep died of it) and restarts it on Py4J/connection
errors, retrying the fixture once on a fresh session.
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


RECYCLE_EVERY = int(os.environ.get("CONF_RECYCLE_EVERY", "200"))


def _session_dead(exc: Exception) -> bool:
    """True when the error means the JVM/gateway is gone (not a fixture
    bug): retrying on the same session can only error again."""
    name = type(exc).__name__
    text = f"{name}: {exc}"
    return any(
        s in text
        for s in (
            "ConnectionRefused",
            "Connection refused",
            "Java gateway process",
            "Py4JNetworkError",
            "Answer from Java side is empty",
            "defaultParallelism",  # dead-gateway symptom seen in r2 sweep
        )
    )


def main() -> None:
    from groonga_spark.conformance import Unsupported, run_fixture, parse_script
    from groonga_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--resume"]
    resume = "--resume" in sys.argv[1:]
    dirs = args or sorted(
        os.path.basename(p.rstrip("/"))
        for p in glob.glob(f"{SUITE}/*/")
    )
    paths = fixtures(dirs)
    prior: dict[str, dict] = {}
    if resume and os.path.exists(f"{REPO}/CONFORMANCE.json"):
        with open(f"{REPO}/CONFORMANCE.json") as f:
            prior = json.load(f).get("detail", {})
    print(f"sweeping {len(paths)} fixtures from {len(dirs)} dirs"
          + (f" (resume: {len(prior)} prior rows)" if resume else ""),
          flush=True)

    def fresh_spark():
        return get_spark(
            "conformance_sweep", cores=8, shuffle_partitions=8
        )

    spark = fresh_spark()
    n_since_recycle = 0
    work = "/tmp/conf_sweep_db"

    # resume keeps prior rows for fixtures OUTSIDE the swept dirs too, so
    # a scoped `--resume <dir>` rechecks one area without dropping the
    # rest of the scoreboard
    swept = {p[len(SUITE) + 1 : -5] for p in paths}
    detail: dict[str, dict] = (
        {rel: row for rel, row in prior.items() if rel not in swept}
        if resume
        else {}
    )
    t0 = time.time()
    for i, tpath in enumerate(paths):
        rel = tpath[len(SUITE) + 1 : -5]
        if resume and prior.get(rel, {}).get("status") == "pass":
            # error/fail/skip rows re-run: a skip may have become
            # supported since the prior sweep
            detail[rel] = prior[rel]
            continue
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
        if n_since_recycle >= RECYCLE_EVERY:
            print(f"[{i}] recycling SparkSession", flush=True)
            try:
                spark.stop()
            except Exception:  # noqa: BLE001
                pass
            spark = fresh_spark()
            n_since_recycle = 0
        t1 = time.time()
        results = None
        for attempt in (0, 1):
            try:
                results = run_fixture(
                    spark, f"{work}/db{i}_{attempt}", test_text,
                    expected_text,
                )
                break
            except Unsupported as e:
                detail[rel] = {"status": "skip", "reason": str(e)[:200]}
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 0 and _session_dead(e):
                    print(f"[{i}] session died ({type(e).__name__}); "
                          "restarting", flush=True)
                    try:
                        spark.stop()
                    except Exception:  # noqa: BLE001
                        pass
                    spark = fresh_spark()
                    n_since_recycle = 0
                    continue
                detail[rel] = {
                    "status": "error",
                    "reason": repr(e)[:300],
                    "trace": traceback.format_exc().splitlines()[-3:],
                }
                break
        n_since_recycle += 1
        if results is None:
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
        "n_fixtures": len(detail),
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
        f"Totals over {len(detail)} fixtures: "
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
