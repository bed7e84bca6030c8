"""Order-balanced old-vs-new A/B for one or more bench queries.

``quiet_ab.py --alt`` interleaves suspects with controls but runs the two
arms in a FIXED order within each rep, which hands the second arm a warm
page-cache/codegen advantage — round 14 measured a fake -31% "win" from
exactly that confounder.  This tool times (current, alt) pairs with the
ARM ORDER ALTERNATING PER REP and reports per-arm medians overall AND
split by position, so a result that only holds when an arm runs second
is visible immediately.  A sub-second pinned control (expr_filter) runs
between pairs as the burst detector.

Usage:
    python tools/ab_balanced.py --alt <query>=<module_path>:<attr> \
        [--alt <query2>=...] [query-with-no-alt ...]
    SPARK_GRAFT_AB_REPEATS=10 python tools/ab_balanced.py --alt ...

Queries named WITHOUT --alt are timed the same balanced way against
nothing (position-split medians of the single arm still expose drift).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONTROL = "expr_filter"


def _load_attr(mod_path: str, attr: str):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"ab_alt_{attr}_{abs(hash(mod_path))}", mod_path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, attr)


def main() -> None:
    names, alts = [], {}
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--alt":
            spec = next(it)
            qname, target = spec.split("=", 1)
            mod_path, attr = target.rsplit(":", 1)
            alts[qname] = (mod_path, attr)
            if qname not in names:
                names.append(qname)
        else:
            names.append(a)
    if not names:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    repeats = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "8"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from feathub_spark import default_spark_session
    from feathub_spark.common.caching import release_caches
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    arms = {}  # name -> [(label, fn), ...]
    for n in names:
        pair = [("cur", qs[n])]
        if n in alts:
            pair.append(("alt", _load_attr(*alts[n])))
        arms[n] = pair

    cpus = int(os.environ.get("SPARK_GRAFT_AB_CPUS", "32"))
    spark = default_spark_session("feathub_spark_ab_balanced", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def run_once(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_caches()
        spark.catalog.clearCache()
        return dt

    # untimed warmup of every arm + control: equal codegen/scan caches
    for n in names:
        for _, fn in arms[n]:
            run_once(fn)
    ctl_fn = qs.get(CONTROL)
    if ctl_fn is not None:
        run_once(ctl_fn)

    # runs[name][label] -> list of (position, seconds); position 0 = ran
    # first in its pair this rep
    runs = {n: {lab: [] for lab, _ in arms[n]} for n in names}
    ctl = []
    for rep in range(repeats):
        for n in names:
            pair = list(arms[n])
            if rep % 2 == 1:
                pair = pair[::-1]
            for pos, (lab, fn) in enumerate(pair):
                runs[n][lab].append((pos, run_once(fn)))
            if ctl_fn is not None:
                ctl.append(run_once(ctl_fn))

    out = {"repeats": repeats, "sf_dir": sf_dir, "queries": {}}
    if ctl:
        out["control"] = {
            "name": CONTROL,
            "median": round(statistics.median(ctl), 3),
            "min": round(min(ctl), 3),
            "max": round(max(ctl), 3),
        }
    for n in names:
        q = {}
        for lab, samples in runs[n].items():
            secs = [s for _, s in samples]
            first = [s for p, s in samples if p == 0]
            second = [s for p, s in samples if p == 1]
            q[lab] = {
                "median": round(statistics.median(secs), 3),
                "min": round(min(secs), 3),
                "max": round(max(secs), 3),
                "median_when_first": round(statistics.median(first), 3)
                if first else None,
                "median_when_second": round(statistics.median(second), 3)
                if second else None,
                "runs": [round(s, 3) for s in secs],
            }
        if "alt" in q:
            q["cur_over_alt"] = round(
                q["cur"]["median"] / q["alt"]["median"], 3
            )
        out["queries"][n] = q
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
