#!/usr/bin/env python3
"""Replay the driver's DuckDB-oracle comparison over a Verify dump, through
several plausible value-read paths, to find which path the driver uses.

Usage: python3 tools/replay_compare.py /tmp/verify_out /root/testdata/sf0.01 [path]
  path in {fetchall, duckdf, pandas_vs_duckdf, all}
"""
import sys, json, glob, os
import duckdb

def rows_fetchall(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()

def rows_df(df):
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False)]

def canon(cols, rows):
    # Deliberately PATH-SENSITIVE stringification (str() of whatever the read
    # path yields): surfacing None-vs-NaN and repr differences between read
    # paths is this tool's purpose, since the driver's comparator has the
    # same property. Rows are sorted, so ORDER BY differences are invisible
    # by design (no registered oracle has an order-sensitive hash).
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(str(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def compare(name, scols, srows, ocols, orows, verbose=False):
    import itertools
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    ok_schema = sc == oc
    ok_rows = len(sr) == len(orr)
    ok_hash = sr == orr
    if not ok_hash and verbose:
        if len(sr) != len(orr):
            print(f"    row-count diff: spark {len(sr)} vs oracle {len(orr)}")
        for i, (a, b) in enumerate(itertools.zip_longest(sr, orr, fillvalue=('<missing>',))):
            if a != b:
                print(f"    first diff row {i}:\n      spark:  {a}\n      oracle: {b}")
                break
    return ok_schema, ok_rows, ok_hash

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "all"
    con = duckdb.connect()
    for t in ['lineitem','embeddings','orders','customer','supplier','part',
              'nation','region','documents','events']:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    paths = ["fetchall", "duckdf", "pandas_vs_duckdf"] if mode == "all" else [mode]
    fails = {p: [] for p in paths}
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"{name}: MISSING dump"); continue
        sql = oracle[name]
        spark_glob = f"{qdir}/*.parquet"
        for p in paths:
            try:
                if p == "fetchall":
                    scols, srows = rows_fetchall(con, f"SELECT * FROM '{spark_glob}'")
                    ocols, orows = rows_fetchall(con, sql)
                elif p == "duckdf":
                    scols, srows = rows_df(con.execute(f"SELECT * FROM '{spark_glob}'").df())
                    ocols, orows = rows_df(con.execute(sql).df())
                elif p == "pandas_vs_duckdf":
                    import pandas as pd
                    fr = [pd.read_parquet(f) for f in sorted(glob.glob(spark_glob))]
                    sdf = pd.concat(fr) if fr else pd.DataFrame()
                    scols, srows = rows_df(sdf)
                    ocols, orows = rows_df(con.execute(sql).df())
                s, r, h = compare(name, scols, srows, ocols, orows,
                                  verbose=(mode != "all"))
                if not (s and r and h):
                    fails[p].append((name, s, r, h))
            except Exception as e:
                fails[p].append((name, 'ERR', str(e)[:120], None))
    for p in paths:
        print(f"\n== path {p}: {len(fails[p])} failures ==")
        for f in fails[p]:
            print(f"  {f}")

if __name__ == "__main__":
    main()
