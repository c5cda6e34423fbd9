"""Mimic the external driver: ray pre-init, import __ray_entry__, run each
query vs its DuckDB oracle at sf0.01 (or sf0.001 with --sf). Optionally
filter to a subset of query names given as argv."""
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

SF = "/root/testdata/sf0.01"
args = [a for a in sys.argv[1:] if not a.startswith("--")]
if "--sf0.001" in sys.argv:
    SF = "/root/testdata/sf0.001"

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(ray_df, ora_df, atol=1.5e-6):
    """3-way verdict: (ok, why, exact). The external driver HASHES rounded
    values, so only exact counts as fully safe; ok-but-inexact queries pass
    the atol gate locally but would be red at the driver (the round-4
    sage_agg lesson) — they are surfaced as ok_inexact."""
    if len(ray_df) != len(ora_df):
        return False, f"rows {len(ray_df)} vs {len(ora_df)}", False
    a, b = canon(ray_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        return False, f"cols {list(a.columns)} vs {list(b.columns)}", False
    exact = True
    for c in a.columns:
        x, y = a[c], b[c]
        if np.issubdtype(x.dtype, np.number) and np.issubdtype(y.dtype, np.number):
            xv, yv = x.to_numpy(np.float64), y.to_numpy(np.float64)
            both_nan = np.isnan(xv) & np.isnan(yv)
            if not ((xv == yv) | both_nan).all():
                exact = False
            if not np.allclose(xv, yv, atol=atol, rtol=0, equal_nan=True):
                bad = np.where(~np.isclose(xv, yv, atol=atol, rtol=0,
                                           equal_nan=True))[0][:3]
                return False, f"col {c} differs at rows {bad.tolist()}: " \
                    f"{x.iloc[bad].tolist()} vs {y.iloc[bad].tolist()}", False
        else:
            if not (x.astype(str).to_numpy() == y.astype(str).to_numpy()).all():
                bad = np.where(x.astype(str).to_numpy()
                               != y.astype(str).to_numpy())[0][:3]
                return False, f"col {c} str-differs rows {bad.tolist()}: " \
                    f"{x.iloc[bad].tolist()} vs {y.iloc[bad].tolist()}", False
    return True, "", exact


def main():
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             ignore_reinit_error=True)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    qs = m.queries()
    oracles = m.oracle_sql()
    names = args if args else list(qs)
    out = {"sf": SF, "queries": {}, "fails": []}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        t0 = time.time()
        try:
            res = to_pandas(qs[name](SF))
            dt = time.time() - t0
            if name in oracles:
                ora = con.sql(oracles[name]).df()
                ok, why, exact = compare(res, ora)
                status = ("ok" if exact else "ok_INEXACT") if ok \
                    else f"MISMATCH: {why}"
            else:
                status = "rows_only_ok" if len(res) > 0 else "rows_only_EMPTY"
            out["queries"][name] = {"rows": len(res),
                                    "ray_sec": round(dt, 2),
                                    "status": status}
            flag = "" if status in ("ok", "rows_only_ok") \
                else ("  <<< FAIL (inexact)" if "INEXACT" in status
                      else "  <<< FAIL")
            print(f"{name:28s} {len(res):8d} rows  {dt:6.2f}s  {status}{flag}")
            if status != "ok" and status != "rows_only_ok":
                out["fails"].append(name)
        except Exception as e:
            import traceback
            traceback.print_exc()
            out["queries"][name] = {"status": f"ERROR: {e}"}
            out["fails"].append(name)
            print(f"{name:28s} ERROR: {e}  <<< FAIL")
    print("FAILS:", out["fails"])
    with open("/tmp/drive_out.json", "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
