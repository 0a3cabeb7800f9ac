"""Summarize a verbose parity-tier log: per-row outcome + counts.

Usage: python _summarize_parity.py .parity_r5_tpu_alp.log [...]
"""
import re
import sys

for path in sys.argv[1:]:
    passed, failed, other = [], [], []
    try:
        text = open(path).read()
    except OSError as e:
        print(f"{path}: {e}")
        continue
    for m in re.finditer(r"::(\w+)\[([^\]]+)\] (PASSED|FAILED|ERROR)", text):
        row = f"{m.group(1)}[{m.group(2)}]"
        (passed if m.group(3) == "PASSED" else failed).append(row)
    print(f"== {path}: {len(passed)} passed, {len(failed)} failed")
    for r in failed:
        print(f"   FAIL {r}")
