#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, then
compares row multisets (exact values, column-name-sorted) and schemas.
"""
import sys, os, json, duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        if name not in oracles:
            print(f"[rows-only] {name}: rows={got.df().shape[0]}")
            continue
        try:
            exp = con.sql(oracles[name])
            gdf, edf = got.df(), exp.df()
        except Exception as e:
            print(f"[XX ] {name} oracle error: {e}")
            n_fail += 1
            continue
        cols_g, cols_e = sorted(gdf.columns), sorted(edf.columns)
        status, msgs = "PASS", []
        if cols_g != cols_e:
            status = "FAIL"; msgs.append(f"cols {cols_g} vs {cols_e}")
        else:
            g = gdf[cols_g].sort_values(cols_g, kind="mergesort").reset_index(drop=True)
            e = edf[cols_e].sort_values(cols_e, kind="mergesort").reset_index(drop=True)
            if len(g) != len(e):
                status = "FAIL"; msgs.append(f"rows {len(g)} vs {len(e)}")
            elif not g.equals(e):
                # pinpoint first mismatching cell
                status = "FAIL"
                neq = (g != e) & ~(g.isna() & e.isna())
                for c in cols_g:
                    if neq[c].any():
                        i = neq[c].idxmax()
                        msgs.append(f"col {c} row {i}: {g[c][i]!r} vs {e[c][i]!r}")
                        break
            # dtype check (schema-ish)
            for c in cols_g:
                if str(gdf[c].dtype) != str(edf[c].dtype):
                    msgs.append(f"dtype {c}: {gdf[c].dtype} vs {edf[c].dtype}")
                    if status == "PASS":
                        status = "WARN"
        mark = {"PASS": "ok ", "WARN": "~~ ", "FAIL": "XX "}[status]
        print(f"[{mark}] {name} rows={len(gdf)} {'; '.join(msgs)}")
        if status == "FAIL":
            n_fail += 1
        else:
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
