"""Summarize parity burn-in logs into the per-family table committed as
PARITY_RESULTS_r{N}.md.

Usage: python tests/slow/summarize.py LOG [LOG...]

Parses pytest -q/-v output lines (PASSED/FAILED ids and the short-summary
`FAILED path::test[param]` lines), dedupes across logs (later logs win),
and prints a per-family pass/fail table plus the failure list with a
timeout-vs-wrong-answer classification (budget TimeoutError lines are
identified from the `--tb=line` output when present).
"""

import re
import sys
from collections import defaultdict


def parse(paths):
    status = {}  # test id -> (ok: bool, why: str)
    fail_why = {}
    for path in paths:
        try:
            text = open(path, errors="replace").read()
        except OSError:
            continue
        # -v style lines
        for m in re.finditer(r"(tests/\S+::\S+?\[[^\]]*\])\s+(PASSED|FAILED)", text):
            status[m.group(1)] = m.group(2) == "PASSED"
        # short summary lines (also emitted by -q)
        for m in re.finditer(r"^FAILED (tests/\S+::\S+?\[[^\]]*\])", text, re.M):
            status[m.group(1)] = False
        # --tb=line reasons directly above the summary
        for m in re.finditer(
            r"^(tests/\S+::\S+?\[[^\]]*\]).*?(TimeoutError|AssertionError|"
            r"BufferOverflow|[A-Za-z]+Error)", text, re.M,
        ):
            fail_why.setdefault(m.group(1), m.group(2))
        for m in re.finditer(
            r"^/\S+?:\d+: (TimeoutError|AssertionError|\w+Error)", text, re.M
        ):
            pass  # positional; the nodeid variant above is authoritative
    return status, fail_why


def family(test_id):
    m = re.search(r"::test_(\w+)\[", test_id)
    return m.group(1) if m else "?"


def main():
    status, fail_why = parse(sys.argv[1:])
    fams = defaultdict(lambda: [0, 0])
    fails = []
    for tid, ok in sorted(status.items()):
        fams[family(tid)][0 if ok else 1] += 1
        if not ok:
            fails.append(tid)
    total_p = sum(p for p, _ in fams.values())
    total_f = sum(f for _, f in fams.values())
    print("| family | passed | failed |")
    print("|---|---|---|")
    for fam in sorted(fams):
        p, f = fams[fam]
        print(f"| {fam} | {p} | {f} |")
    print(f"| **total** | **{total_p}** | **{total_f}** |")
    if fails:
        print("\nFailures:")
        for tid in fails:
            why = fail_why.get(tid, "?")
            kind = "budget-timeout" if "Timeout" in why else (
                "wrong-or-unproved" if "Assertion" in why else why
            )
            print(f"  - {tid}  [{kind}]")


if __name__ == "__main__":
    main()
