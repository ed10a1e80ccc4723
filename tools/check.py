#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part of
the library): runs graft.Verify via sbt, then executes each oracle SQL in
DuckDB over the same parquet tables and compares against the Verify parquet
output — columns sorted by name, rows sorted, exact value compare (with a
report of near-miss floats)."""
import json, math, subprocess, sys, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def compare(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: result missing: {e}")
            n_fail += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        exp = exp.sort_values(list(exp.columns), na_position="first").reset_index(drop=True)
        got = got.sort_values(list(got.columns), na_position="first").reset_index(drop=True)
        bad = []
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            if str(ev.dtype) != str(gv.dtype):
                bad.append(f"dtype[{c}]: exp {ev.dtype} got {gv.dtype}")
            for i in range(len(ev)):
                a, b = ev.iloc[i], gv.iloc[i]
                if a is None or (isinstance(a, float) and math.isnan(a)):
                    ok = b is None or (isinstance(b, float) and math.isnan(b))
                else:
                    ok = (a == b)
                if not ok:
                    near = ""
                    try:
                        if abs(float(a) - float(b)) < 1e-6:
                            near = " (NEAR)"
                    except Exception:
                        pass
                    bad.append(f"{c}[{i}]: exp={a!r} got={b!r}{near}")
                    if len(bad) > 5:
                        break
            if len(bad) > 5:
                break
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:6]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return n_fail

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if os.environ.get("SKIP_VERIFY") != "1":
        r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                           cwd="/root/repo", capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
        if r.returncode != 0:
            print("verify run failed:\n" + tail)
            sys.exit(2)
        for line in (r.stdout + r.stderr).splitlines():
            if "[verify]" in line:
                print(line)
    sys.exit(1 if compare(sf_dir, out_dir, only) else 0)
