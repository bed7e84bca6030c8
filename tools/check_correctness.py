"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, then
compare row count, sorted column names, and sorted row values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            s = s.map(
                lambda v: tuple(v.tolist())
                if isinstance(v, np.ndarray)
                else (
                    tuple(v)
                    if isinstance(v, list)
                    else (tuple(sorted(v.items())) if isinstance(v, dict) else v)
                )
            )
        if str(s.dtype).startswith("datetime64"):
            s = s.astype("datetime64[us]")
        if str(s.dtype) in ("float32",):
            s = s.astype("float64")
        if str(s.dtype).startswith("int32") or str(s.dtype).startswith("int16"):
            s = s.astype("int64")
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _driver_hostile_cols(df: pd.DataFrame) -> list:
    """Columns the DRIVER's canonicalizer (plain sort_values, no
    tuple-normalization) would die on: list/ndarray/dict values.  The
    local replica must be STRICTER than the driver here — round 8 shipped
    two red rows because this tool normalized lists that the driver
    cannot."""
    bad = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            probe = s.dropna().head(20)
            if any(
                isinstance(v, (list, dict, np.ndarray, tuple)) for v in probe
            ):
                bad.append(c)
    return bad


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list:
    issues = []
    for side, df in (("spark", spark_df), ("oracle", oracle_df)):
        for c in _driver_hostile_cols(df):
            issues.append(
                f"driver-hostile {side} column {c!r} (list/map values — "
                "project to a joined string before registering)"
            )
    if issues:
        return issues
    if len(spark_df) != len(oracle_df):
        issues.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_df.columns)
    if s_cols != o_cols:
        issues.append(f"columns spark={s_cols} oracle={o_cols}")
        return issues
    if issues:
        return issues
    # dtype comparison BEFORE normalization: the driver may match schemas
    # strictly, so surface any raw dtype divergence as a warning
    for c in spark_df.columns:
        sd, od = str(spark_df[c].dtype), str(oracle_df[c].dtype)
        if sd != od:
            # datetime64 resolution (ns vs us) is a pandas-conversion
            # artifact, not a schema divergence: Spark's toPandas yields
            # ns, DuckDB's yields us, and _normalize unifies both to us
            # before values are compared — don't warn on it
            if sd.startswith("datetime64") and od.startswith("datetime64"):
                continue
            issues.append(f"[dtype-warn] col {c}: spark={sd} oracle={od}")
    s = _normalize(spark_df)
    o = _normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if str(sv.dtype).startswith("float") or str(ov.dtype).startswith("float"):
            eq = (
                (sv.isna() & ov.isna())
                | (sv == ov)
            )
        else:
            eq = (sv.isna() & ov.isna()) | (sv.astype(object) == ov.astype(object))
        bad = (~eq).sum()
        if bad:
            idx = (~eq).idxmax()
            issues.append(
                f"col {c}: {bad} mismatches, first at row {idx}: "
                f"spark={sv[idx]!r} oracle={ov[idx]!r}"
            )
    return issues


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from feathub_spark import default_spark_session

    spark = default_spark_session("check_correctness", cpus=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    con.execute("SET TimeZone='UTC'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    from feathub_spark.common.caching import release_caches

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = [f"SPARK ERROR: {type(e).__name__}: {e}"]
            print(f"[FAIL-spark] {name}: {results[name][0][:400]}")
            continue
        finally:
            # keep executor storage flat across the 157-query sweep (the
            # operators' caching contract leaves release to the caller)
            release_caches()
        t1 = time.time()
        if name not in oracles:
            results[name] = []
            print(f"[rows-only] {name}: {len(sdf)} rows in {t1 - t0:.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = [f"ORACLE ERROR: {type(e).__name__}: {e}"]
            print(f"[FAIL-oracle] {name}: {results[name][0][:400]}")
            continue
        issues = compare(name, sdf, odf)
        hard = [i for i in issues if not i.startswith("[dtype-warn]")]
        results[name] = hard
        status = "OK" if not hard else "MISMATCH"
        if not hard and issues:
            status = "OK~"  # value-clean with dtype warnings
        print(f"[{status}] {name}: {len(sdf)} rows, spark {t1 - t0:.1f}s")
        for i in issues[:4]:
            print(f"    - {i[:400]}")

    n_bad = sum(1 for v in results.values() if v)
    print(f"\n{len(results) - n_bad}/{len(results)} queries clean")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
