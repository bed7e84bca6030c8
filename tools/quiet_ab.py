"""Isolated interleaved quiet-run timing for named bench queries.

The driver bench's per-query numbers drift 2-3x on this host with zero
code change (BASELINE.md documents the signature), so a query flagged
>2x its pinned r6 median needs a dedicated closure run: interleave the
suspect queries round-robin with sub-second CONTROL queries in one
Spark session, many repeats, and report medians plus the controls'
drift factor.  If the controls are flat and the suspect's median is
back under 1.25x its pin, the flag was environmental; if the controls
are flat and the suspect stays high, the regression is real.

Usage:
    python tools/quiet_ab.py ngram_jaccard sample_shard pack_sequences
    SPARK_GRAFT_AB_REPEATS=9 python tools/quiet_ab.py pit_join ivf_ann

Optional A/B of a module variant: pass --alt <query>=<module_path>:<attr>
to time an alternative implementation interleaved with the current one.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONTROLS = ["sql_view_tpch_q6", "expr_filter"]


def _parse_args(argv):
    """(names, alts): ``--alt <query>=<module_path>:<attr>`` times an
    alternative implementation (a callable taking (spark, sf_dir))
    interleaved with the current one under the name ``<query>__alt``."""
    names, alts = [], {}
    it = iter(argv)
    for a in it:
        if a == "--alt":
            try:
                spec = next(it)
                qname, target = spec.split("=", 1)
                mod_path, attr = target.rsplit(":", 1)
            except (StopIteration, ValueError):
                print("--alt expects <query>=<module_path>:<attr>", file=sys.stderr)
                sys.exit(2)
            alts[qname] = (mod_path, attr)
            if qname not in names:
                names.append(qname)
        elif a.startswith("--"):
            print(f"unknown flag {a}", file=sys.stderr)
            sys.exit(2)
        else:
            names.append(a)
    return names, alts


def main() -> None:
    names, alts = _parse_args(sys.argv[1:])
    if not names:
        print("usage: quiet_ab.py <query> [query ...] "
              "[--alt <query>=<module_path>:<attr>]", file=sys.stderr)
        sys.exit(2)
    repeats = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "7"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from feathub_spark import default_spark_session
    from feathub_spark.common.caching import release_caches
    import __spark_entry__ as entry_mod
    from bench import R6_BASELINE

    qs = entry_mod.queries()
    for qname, (mod_path, attr) in alts.items():
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            f"quiet_ab_alt_{attr}", mod_path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        qs[f"{qname}__alt"] = getattr(mod, attr)
        names.append(f"{qname}__alt")
    controls = [c for c in CONTROLS if c in qs and c not in names]
    plan = names + controls
    missing = [n for n in plan if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)

    spark = default_spark_session("feathub_spark_quiet_ab", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    # one untimed warmup pass so codegen/scan caches are equal for all
    for n in plan:
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_caches()
        spark.catalog.clearCache()

    runs: dict[str, list[float]] = {n: [] for n in plan}
    for _ in range(repeats):
        for n in plan:
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[n].append(time.time() - t0)
            release_caches()
            spark.catalog.clearCache()

    out = {}
    for n in plan:
        med = statistics.median(runs[n])
        row = {
            "median": round(med, 3),
            "min": round(min(runs[n]), 3),
            "max": round(max(runs[n]), 3),
            "runs": [round(r, 3) for r in runs[n]],
            "role": "control" if n in controls else "suspect",
        }
        pin = R6_BASELINE.get(n)
        if pin:
            row["r6_pin"] = pin
            row["vs_r6"] = round(med / pin, 3)
        out[n] = row
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
