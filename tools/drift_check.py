#!/usr/bin/env python3
"""Documentation-drift tripwire (the r6/r7 verdict class, plus the
round-8 phantom-bench-snapshot instance): mechanically cross-reference
the committed artifacts so STATUS/COVERAGE claims can't silently
diverge from the code. Not shipped engine code — a development harness
wired into tools/preflight.sh.

Checks:
  1. EXCHANGES.txt and EXCHANGES_sf0.1.txt hold the same query set
     (sorted-identical rows — the cross-SF identity, cheaply re-stated
     here so a stale ledger fails even before sbt runs).
  2. Every ledger query name appears in COVERAGE.md — a new query
     without documentation is drift in the other direction.
  3. STATUS.md's headline "**N oracle-checked queries**" equals the
     ledger row count.
  4. Every BENCH_local_*.json referenced in STATUS.md exists on disk,
     and the newest one covers every ledger query (the phantom
     snapshot class).
  5. Every queries/Extended*.scala object is registered in
     SparkEntry.scala (an unregistered file is dead surface).
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read(path):
    with open(os.path.join(REPO, path), encoding="utf-8") as f:
        return f.read()


def main() -> int:
    errs = []

    led = [l.split()[0] for l in read("EXCHANGES.txt").splitlines() if l.strip()]
    led_sf = [l.split()[0] for l in read("EXCHANGES_sf0.1.txt").splitlines()
              if l.strip()]
    if sorted(led) != sorted(led_sf):
        errs.append("EXCHANGES.txt vs EXCHANGES_sf0.1.txt: query sets differ "
                    f"({len(led)} vs {len(led_sf)} rows)")

    coverage = read("COVERAGE.md")
    undocumented = [q for q in led if q not in coverage]
    if undocumented:
        errs.append(f"{len(undocumented)} ledger queries missing from "
                    f"COVERAGE.md: {', '.join(sorted(undocumented)[:10])}")

    status = read("STATUS.md")
    m = re.search(r"\*\*(\d+) oracle-checked queries\*\*", status)
    if not m:
        errs.append("STATUS.md: no '**N oracle-checked queries**' headline")
    elif int(m.group(1)) != len(led):
        errs.append(f"STATUS.md claims {m.group(1)} oracle-checked queries; "
                    f"ledger has {len(led)}")

    for bench in sorted(set(re.findall(r"BENCH_local_r\d+\.json", status))):
        if not os.path.exists(os.path.join(REPO, bench)):
            errs.append(f"STATUS.md references {bench}, which does not exist "
                        "(the phantom-snapshot class)")
    snaps = sorted(glob.glob(os.path.join(REPO, "BENCH_local_r*.json")))
    if snaps:
        newest = snaps[-1]
        data = json.load(open(newest))
        missing = [q for q in led if q not in data.get("queries", {})]
        if missing:
            errs.append(f"{os.path.basename(newest)} missing medians for "
                        f"{len(missing)} ledger queries: "
                        f"{', '.join(sorted(missing)[:10])}")

    entry = read("src/main/scala/graft/SparkEntry.scala")
    for f in sorted(glob.glob(os.path.join(
            REPO, "src/main/scala/graft/queries/Extended*.scala"))):
        obj = os.path.basename(f)[:-len(".scala")]
        if f"{obj}.all" not in entry:
            errs.append(f"queries/{obj}.scala exists but {obj}.all is not "
                        "registered in SparkEntry")

    if errs:
        print("DRIFT: FAIL")
        for e in errs:
            print(f"  - {e}")
        return 1
    print(f"DRIFT: OK ({len(led)} queries consistent across ledgers, "
          "COVERAGE, STATUS, bench snapshot, SparkEntry)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
