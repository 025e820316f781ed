"""Local mimic of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive values).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

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

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:   # noqa: BLE001
            print(f"[ERR ] {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows (no SQL oracle)")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:   # noqa: BLE001
            print(f"[ERR ] {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        ec, er = canon(exp)
        if gc != ec:
            print(f"[FAIL] {name}: schema {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"[FAIL] {name}: rows {len(gr)} != {len(er)}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
            print(f"[FAIL] {name}: values differ, first at sorted row {bad}:")
            print("   got:", gr[bad])
            print("   exp:", er[bad])
            n_fail += 1
        else:
            print(f"[ok  ] {name}: {len(gr)} rows match")
            n_pass += 1
    print(f"\n{n_pass} matched, {n_rowsonly} rows-only, {n_fail} failed")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
