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

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, list): return tuple(canon(x) for x in v)
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
        got_rel = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = [c[0] for c in got_rel.description]
        got = got_rel.fetchall()
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only): {len(got)} rows")
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [c[0] for c in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as ex:
            n_fail += 1
            print(f"  FAIL {name}: oracle SQL error: {str(ex).splitlines()[0][:150]}")
            continue
        ok = True; msg = ""
        # Strict dtype gate (r2 lesson: q72's oracle window-SUM came back
        # HUGEINT -> pandas float64 while the dump was int64; values
        # compared equal here (0.0 == 0) but the driver's type-sensitive
        # hash flagged a mismatch). Compare pandas dtypes exactly.
        try:
            import pandas as pd
            gdt = {c: str(t) for c, t in pd.read_parquet(d).dtypes.items()}
            edt = {c: str(t) for c, t in con.execute(oracle[name]).df().dtypes.items()}
            if gdt != edt:
                diff = {c: (gdt.get(c), edt.get(c))
                        for c in set(gdt) | set(edt) if gdt.get(c) != edt.get(c)}
                ok = False; msg = f"dtypes {diff}"
        except Exception as ex:
            ok = False; msg = f"dtype check error: {str(ex)[:120]}"
        if not ok:
            pass
        elif sorted(got_cols) != sorted(exp_cols):
            ok = False; msg = f"cols {sorted(got_cols)} vs {sorted(exp_cols)}"
        elif len(got) != len(exp):
            ok = False; msg = f"rows {len(got)} vs {len(exp)}"
        else:
            gi = [got_cols.index(c) for c in sorted(got_cols)]
            ei = [exp_cols.index(c) for c in sorted(exp_cols)]
            for rn, (g, e) in enumerate(zip(got, exp)):
                gr = tuple(canon(g[i]) for i in gi)
                er = tuple(canon(e[i]) for i in ei)
                if gr != er:
                    ok = False
                    msg = f"row {rn}: {gr} vs {er}"
                    break
        if ok:
            n_pass += 1
            print(f"  PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"  FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
