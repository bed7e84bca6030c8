"""Rotate the driver's first-50 CORRECTNESS window in __spark_entry__.py.

The grading driver hash-checks only the FIRST 50 entries of `queries()`
each round, so window placement is how queries earn driver-hard
correctness evidence.  This tool rewrites the _RAW_QUERIES dict so the
first 50 slots hold the queries whose driver evidence is OLDEST (never
checked first, then stalest round), while rows-only queries (no
oracle_sql entry — they can never hash-match) are always pushed behind
position 50.  The remaining queries keep their current relative order.

Usage:
    python tools/rotate_window.py           # show the plan (dry run)
    python tools/rotate_window.py --apply   # rewrite __spark_entry__.py

After --apply: self-verify the new window at sf0.01 AND sf0.1
(tools/check_correctness.py) and run tests/test_driver_canon.py before
committing — placement changes are behavior-neutral, but the window is
the hard gate and deserves the full recipe.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")
WINDOW = 50


def last_checked_round() -> dict:
    """name -> last round with a hash-GREEN driver row.  Rows that
    errored or mismatched do not count as evidence — a red query keeps
    window priority until it has actually gone green (round 8's
    tokenize_ids shipped red and needed exactly this re-check)."""
    last = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for name, row in json.load(open(f)).items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                last[name] = rnd
    return last


def main() -> None:
    src = open(ENTRY).read()
    pre, rest = src.split("_RAW_QUERIES = {", 1)
    block, post = rest.split("\n}", 1)
    entries = re.findall(r'"([a-z0-9_]+)": (_q_\w+),', block)
    fns = dict(entries)
    order = [n for n, _ in entries]

    oracle_block = src.split("def oracle_sql()")[1]
    oracled = set(re.findall(r'"([a-z0-9_]+)":', oracle_block))
    last = last_checked_round()

    # staleness key: never-checked sorts first, then oldest round; current
    # registry order breaks ties so reruns are deterministic
    pos = {n: i for i, n in enumerate(order)}
    eligible = [n for n in order if n in oracled]
    eligible.sort(key=lambda n: (last.get(n, -1), pos[n]))
    window = eligible[:WINDOW]
    tail = [n for n in order if n not in set(window)]
    new_order = window + tail

    print(f"{len(order)} queries, {len(oracled)} oracle-gated, "
          f"{len(order) - len(oracled)} rows-only (always behind {WINDOW})")
    print("\nnew window (slot: query, last driver round):")
    for i, n in enumerate(new_order[:WINDOW], 1):
        print(f"  {i:3d}: {n:28s} r{last.get(n, 0) or '-never-'}")

    if "--apply" not in sys.argv:
        print("\ndry run — pass --apply to rewrite __spark_entry__.py")
        return
    lines = "".join(f'        "{n}": {fns[n]},\n' for n in new_order)
    open(ENTRY, "w").write(pre + "_RAW_QUERIES = {\n" + lines + "}" + post)
    print(f"\nrewrote {ENTRY}; now run the self-verify recipe above")


if __name__ == "__main__":
    main()
