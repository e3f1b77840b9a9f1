#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [jsonOut]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle in DuckDB against the sfDir parquet tables, and compares against the
parquet dumps Spark wrote. Comparison: sort columns by name, exact value
equality in row order (the strictest interpretation of the driver's hash
compare), plus a diagnostic order-insensitive pass.
"""
import duckdb, json, math, sys, os, glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            results[name] = {"status": "fail", "reason": "no spark output"}
            n_fail += 1
            continue
        try:
            exp = con.sql(oracle[name])
            exp_cols = sorted(exp.columns)
            exp_rows = [tuple(norm(v) for v in row) for row in
                        con.sql(f"SELECT {', '.join(exp_cols)} FROM ({oracle[name]})").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            results[name] = {"status": "fail", "reason": f"oracle error: {e}"}
            n_fail += 1
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_cols = sorted(got_rel.columns)
        got_rows = [tuple(norm(v) for v in row) for row in
                    con.sql(f"SELECT {', '.join(got_cols)} FROM read_parquet({files!r})").fetchall()]
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns spark={got_cols} oracle={exp_cols}")
            results[name] = {"status": "fail",
                             "reason": f"columns spark={got_cols} oracle={exp_cols}"}
            n_fail += 1
            continue
        if got_rows == exp_rows:
            print(f"PASS {name} ({len(got_rows)} rows)")
            results[name] = {"status": "pass", "rows": len(got_rows)}
            n_pass += 1
        elif sorted(map(repr, got_rows)) == sorted(map(repr, exp_rows)):
            print(f"WARN {name}: values match but ROW ORDER differs")
            results[name] = {"status": "fail", "reason": "row order differs"}
            n_fail += 1
        else:
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            gs, es = set(map(repr, got_rows)), set(map(repr, exp_rows))
            for d in list(gs - es)[:3]:
                print(f"  spark-only: {d[:200]}")
            for d in list(es - gs)[:3]:
                print(f"  oracle-only: {d[:200]}")
            if len(got_rows) == len(exp_rows):
                for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
                    if g != e:
                        print(f"  first diff at row {i}:\n   spark : {g}\n   oracle: {e}")
                        break
            results[name] = {"status": "fail",
                             "reason": f"rows spark={len(got_rows)} oracle={len(exp_rows)}"}
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    # durable machine-readable artifact (r9 verdict item 1b): the driver's
    # CORRECTNESS artifact arrived empty in r9 despite a green local gate —
    # persist the local result so the signal survives a driver glitch.
    if len(sys.argv) > 3:
        import datetime
        payload = {
            "n_pass": n_pass, "n_fail": n_fail,
            "n_entries": len(oracle),
            "generated": datetime.datetime.now(datetime.timezone.utc).isoformat(),
            "sf_dir": sfdir,
            "entries": results,
        }
        with open(sys.argv[3], "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {sys.argv[3]}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
