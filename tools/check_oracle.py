#!/usr/bin/env python3
"""Dev-loop oracle checker: emulates the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each <outDir>/<name> parquet dump, runs <outDir>/oracle_sql.json[name]
in DuckDB with views over <sfDir>/*.parquet, sorts columns by name, and
compares all values exactly (doubles bit-for-bit — our queries are
decimal-stabilized, so any drift is a real bug).
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, list): return tuple(canon(x) for x in v)
    if hasattr(v, "tolist") and getattr(v, "ndim", 0):  # numpy array cell
        return tuple(canon(x) for x in v.tolist())
    if isinstance(v, dict): return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # a query that crashed in Verify leaves no dump dir — that's a FAIL,
    # not a skip, or the gate passes vacuously
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracle) - dumped):
        n_fail += 1
        print(f"  FAIL {name}: no dump (query crashed or was not run)")
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d): continue
        # One pandas frame per side serves values AND dtypes (the oracle
        # SQL — the expensive half — executes exactly once). Both sides
        # go through pandas so null/timestamp representations are
        # symmetric, mirroring the driver's pandas-based hash compare.
        gd = pd.read_parquet(d)
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only): {len(gd)} rows")
            continue
        try:
            ed = con.execute(oracle[name]).df()
        except Exception as ex:
            n_fail += 1
            print(f"  FAIL {name}: oracle SQL error: {str(ex).splitlines()[0][:150]}")
            continue
        got_cols, exp_cols = list(gd.columns), list(ed.columns)
        ok = True; msg = ""
        # Strict dtype gate (r2 lesson: q72's oracle window-SUM came back
        # HUGEINT -> pandas float64 while the dump was int64; values
        # compared equal here (0.0 == 0) but the driver's type-sensitive
        # hash flagged a mismatch). Compare pandas dtypes exactly.
        gdt = {c: str(t) for c, t in gd.dtypes.items()}
        edt = {c: str(t) for c, t in ed.dtypes.items()}
        if gdt != edt:
            diff = {c: (gdt.get(c), edt.get(c))
                    for c in set(gdt) | set(edt) if gdt.get(c) != edt.get(c)}
            ok = False; msg = f"dtypes {diff}"
        elif sorted(got_cols) != sorted(exp_cols):
            ok = False; msg = f"cols {sorted(got_cols)} vs {sorted(exp_cols)}"
        elif len(gd) != len(ed):
            ok = False; msg = f"rows {len(gd)} vs {len(ed)}"
        else:
            order = sorted(got_cols)
            git = gd[order].itertuples(index=False, name=None)
            eit = ed[order].itertuples(index=False, name=None)
            for rn, (g, e) in enumerate(zip(git, eit)):
                gr = tuple(canon(x) for x in g)
                er = tuple(canon(x) for x in e)
                if gr != er:
                    ok = False
                    msg = f"row {rn}: {gr} vs {er}"
                    break
        if ok:
            n_pass += 1
            print(f"  PASS {name} ({len(gd)} rows)")
        else:
            n_fail += 1
            print(f"  FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
