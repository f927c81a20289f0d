"""Driver-style oracle self-check: run every oracle-backed query and its
DuckDB SQL side-by-side at sf0.01 (or --sf), sort columns by name, sort
rows, and compare row counts + values. Mirrors the per-round correctness
gate so oracle drift is caught before the driver runs.

Usage: python tools/check_oracles.py [--sf /root/testdata/sf0.01] [query ...]

``--manifest OUT.json`` additionally writes the FULL surface (including
rows-only queries, recorded with err="no_oracle" like the driver does) in
the exact CORRECTNESS_r*.json shape — so rounds stay comparable even where
the driver's ~50-query sample didn't land (round-3 verdict item 8)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, qfn, sql: str, sf_dir: str) -> str:
    import duckdb

    res = qfn(sf_dir)
    ray_df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    ora_df = con.execute(sql).df()
    if len(ray_df) != len(ora_df):
        return f"ROWS MISMATCH ray={len(ray_df)} oracle={len(ora_df)}"
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        return f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} oracle={sorted(ora_df.columns)}"
    a, b = _normalize(ray_df), _normalize(ora_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
        else:
            apd, bpd = a[c], b[c]
            eq = (apd.to_numpy() == bpd.to_numpy()) | (apd.isna() & bpd.isna()).to_numpy()
        if not eq.all():
            i = int(np.argmin(eq))
            return f"VALUE MISMATCH col={c} row={i} ray={av[i]!r} oracle={bv[i]!r}"
    return "OK"


def _rows_only_record(qfn, sf_dir: str) -> dict:
    """Driver shape for a query with no oracle: run it, count rows,
    record err='no_oracle' exactly like CORRECTNESS_r*.json does."""
    res = qfn(sf_dir)
    n = len(res.to_pandas()) if hasattr(res, "to_pandas") else len(pd.DataFrame(res))
    return {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": int(n),
        "oracle_rows": None,
        "err": "no_oracle",
    }


def _record(verdict: str, qfn, sf_dir: str) -> dict:
    ok = verdict == "OK"
    if not ok and not verdict.startswith(("ROWS", "SCHEMA", "HASH")):
        # an ERROR/exception verdict tells us nothing about rows/schema —
        # record unknown (None), not True, so errored queries never read
        # as partially passing in the CORRECTNESS-shaped manifest
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": verdict,
        }
        return rec
    rec = {
        "rows_match": ok or not verdict.startswith("ROWS"),
        "schema_match": ok or not verdict.startswith(("ROWS", "SCHEMA")),
        "hash_match": ok,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None if ok else verdict,
    }
    if ok:
        try:
            res = qfn(sf_dir)
            n = len(res.to_pandas()) if hasattr(res, "to_pandas") else len(
                pd.DataFrame(res)
            )
            rec["spark_rows"] = rec["oracle_rows"] = int(n)
        except Exception:  # pragma: no cover - count is best-effort
            pass
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--manifest",
        metavar="OUT.json",
        help="write the full-surface CORRECTNESS_r*-shaped JSON here",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if args.names:
        names = args.names
    elif args.manifest:
        names = list(qs)  # full surface, rows-only included
    else:
        names = [n for n in qs if n in oracles]
    failures = 0
    manifest: dict[str, dict] = {}
    for name in names:
        if name not in oracles:
            if args.manifest:
                try:
                    manifest[name] = _rows_only_record(qs[name], args.sf)
                    verdict = f"rows-only ({manifest[name]['spark_rows']} rows)"
                except Exception as exc:  # pragma: no cover
                    manifest[name] = {
                        "rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": None,
                        "oracle_rows": None,
                        "err": f"ERROR {type(exc).__name__}: {exc}",
                    }
                    verdict = manifest[name]["err"]
                    failures += 1
                print(f"{name}: {verdict}")
            else:
                print(f"{name}: (no oracle)")
            continue
        try:
            verdict = compare(name, qs[name], oracles[name], args.sf)
        except Exception as exc:  # pragma: no cover - diagnostic tool
            verdict = f"ERROR {type(exc).__name__}: {exc}"
        print(f"{name}: {verdict}")
        if verdict != "OK":
            failures += 1
        if args.manifest:
            manifest[name] = _record(verdict, qs[name], args.sf)
    if args.manifest:
        import json

        with open(args.manifest, "w") as f:
            json.dump(manifest, f, indent=2)
        print(f"manifest: {args.manifest} ({len(manifest)} queries)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
