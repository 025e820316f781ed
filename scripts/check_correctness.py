"""Local mimic of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive values).

Usage: python scripts/check_correctness.py [--json OUT.json] [sf_dir] [query ...]

Per-query wall time is measured and printed (and recorded in the JSON
report) so a slow query that risks a driver-side gate timeout is visible
*before* the driver runs — see VERDICT r3 "What's wrong" #1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(result, Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    assert isinstance(result, pd.DataFrame)
    return result


def canon(df):
    """Sort columns by name and rows by all values; stringify for comparison."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(df.notna(), None)

    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return list(df.columns), rows


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    import __ray_entry__ as entrymod

    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    report = {}
    t_start = time.monotonic()
    for pos, (name, fn) in enumerate(qs.items(), start=1):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:   # noqa: BLE001
            dt = time.monotonic() - t0
            print(f"[ERR ] #{pos:02d} {name}: query raised "
                  f"{type(e).__name__}: {e}  ({dt:.1f}s)")
            report[name] = {"pos": pos, "status": "error", "sec": round(dt, 2),
                            "error": f"{type(e).__name__}: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            dt = time.monotonic() - t0
            print(f"[rows] #{pos:02d} {name}: {len(got)} rows "
                  f"(no SQL oracle)  ({dt:.1f}s)")
            report[name] = {"pos": pos, "status": "rows_only",
                            "rows": len(got), "sec": round(dt, 2)}
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:   # noqa: BLE001
            dt = time.monotonic() - t0
            print(f"[ERR ] #{pos:02d} {name}: oracle raised "
                  f"{type(e).__name__}: {e}  ({dt:.1f}s)")
            report[name] = {"pos": pos, "status": "oracle_error",
                            "sec": round(dt, 2),
                            "error": f"{type(e).__name__}: {e}"}
            n_fail += 1
            continue
        gc, gr = canon(got)
        ec, er = canon(exp)
        dt = time.monotonic() - t0
        report[name] = {"pos": pos, "rows": len(gr), "sec": round(dt, 2)}
        if gc != ec:
            print(f"[FAIL] #{pos:02d} {name}: schema {gc} != {ec}  ({dt:.1f}s)")
            report[name]["status"] = "schema_mismatch"
            n_fail += 1
        elif len(gr) != len(er):
            print(f"[FAIL] #{pos:02d} {name}: rows {len(gr)} != {len(er)}"
                  f"  ({dt:.1f}s)")
            report[name]["status"] = "rowcount_mismatch"
            n_fail += 1
        elif gr != er:
            bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
            print(f"[FAIL] #{pos:02d} {name}: values differ, first at sorted "
                  f"row {bad}:  ({dt:.1f}s)")
            print("   got:", gr[bad])
            print("   exp:", er[bad])
            report[name]["status"] = "value_mismatch"
            n_fail += 1
        else:
            print(f"[ok  ] #{pos:02d} {name}: {len(gr)} rows match"
                  f"  ({dt:.1f}s)")
            report[name]["status"] = "match"
            n_pass += 1
    total = time.monotonic() - t_start
    print(f"\n{n_pass} matched, {n_rowsonly} rows-only, {n_fail} failed"
          f"  (total {total:.1f}s)")
    slow = sorted(report.items(), key=lambda kv: -kv[1]["sec"])[:10]
    print("slowest:", ", ".join(f"{k}={v['sec']}s" for k, v in slow))
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"total_sec": round(total, 1), "matched": n_pass,
                       "rows_only": n_rowsonly, "failed": n_fail,
                       "queries": report}, f, indent=1)
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
