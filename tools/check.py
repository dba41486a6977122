#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <name>/ parquet dir under verifyOutDir, runs the matching SQL
from oracle_sql.json in DuckDB over <sfDir>/*.parquet tables, sorts
columns by name, sorts rows, and compares values cell-by-cell.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(
            ("%.10g" % v) if isinstance(v, float) else str(v) for v in row))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json")):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)"); continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: cols {scols} vs {ocols}"); n_fail += 1; continue
        stypes = [str(sdf[c].dtype) for c in scols]
        otypes = [str(odf[c].dtype) for c in scols]
        srows = canon(sdf[scols].itertuples(index=False, name=None))
        orows = canon(odf[scols].itertuples(index=False, name=None))
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}"); n_fail += 1; continue
        if srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:\n  spark={srows[bad]}\n  duck ={orows[bad]}")
            n_fail += 1; continue
        note = "" if stypes == otypes else f"  [dtype drift: {list(zip(scols, stypes, otypes))}]"
        print(f"PASS {name}: {len(srows)} rows{note}"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
