#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB against the sf parquet tables, load the Spark result parquet,
sort columns by name + rows by all columns, and compare values.

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>
"""
import hashlib, json, math, os, sys
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.9g}"
    return str(v)

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out

def check_sidecar(sfdir, outdir, name):
    """Cross-check the artifact against the _meta.json sidecar Verify
    wrote: byte-identical parquet parts + matching sf_dir prove the
    compared artifact is exactly what Verify produced this run (a
    mismatch = stale/swapped artifact, the r7/r8 false-negative class)."""
    meta_path = os.path.join(outdir, name, "_meta.json")
    if not os.path.exists(meta_path):
        return "no-sidecar"
    meta = json.load(open(meta_path))
    if os.path.normpath(meta.get("sf_dir", "")) != os.path.normpath(sfdir):
        return f"SF-MISMATCH sidecar={meta.get('sf_dir')} compare={sfdir}"
    # The compare reads the directory's *.parquet glob, so the sidecar
    # must account for every file the glob sees — extra parts dropped
    # into the dir after Verify would otherwise pass the per-file hash
    # loop (which only iterates the sidecar's keys) yet feed the compare.
    actual = {f for f in os.listdir(os.path.join(outdir, name))
              if f.endswith(".parquet")}
    listed = set(meta.get("files", {}).keys())
    if actual != listed:
        return (f"FILE-SET-MISMATCH extra={sorted(actual - listed)} "
                f"missing={sorted(listed - actual)}")
    for fname, want in meta.get("files", {}).items():
        p = os.path.join(outdir, name, fname)
        if not os.path.exists(p):
            return f"MISSING-PART {fname}"
        got = hashlib.sha256(open(p, "rb").read()).hexdigest()
        if got != want:
            return f"BYTES-CHANGED {fname}"
    return "ok"

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Types the driver's compare renders identically to Spark's parquet
    # output regardless of fetch path (fetchall vs pandas). DuckDB
    # silently widens SUM(BIGINT) to HUGEINT, which pandas renders as
    # float64 -> every value hash-mismatches while rows/schema agree;
    # that was the r7/r8 q_salted_join + q_date_spine false-negative
    # signature. Failing here catches the class at dev time.
    PORTABLE = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
                "TIMESTAMP", "TIMESTAMP_NS", "INTEGER"}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exotic = [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()
                      if r[1] not in PORTABLE]
            if exotic:
                print(f"FAIL {name}: oracle emits non-portable types {exotic} "
                      f"(wrap in CAST — HUGEINT et al. diverge under pandas loading)")
                n_fail += 1; continue
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            gcur = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            gcols = [d[0] for d in gcur.description]
            grows = gcur.fetchall()
            oc, orn = norm(orows, ocols)
            gc, grn = norm(grows, gcols)
            if oc != gc:
                print(f"FAIL {name}: columns oracle={oc} got={gc}"); n_fail += 1; continue
            if len(orn) != len(grn):
                print(f"FAIL {name}: rows oracle={len(orn)} got={len(grn)}"); n_fail += 1; continue
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(orn, grn)) if a != b]
            if bad:
                i, a, b = bad[0]
                sc = check_sidecar(sfdir, outdir, name)
                print(f"FAIL {name}: {len(bad)}/{len(orn)} rows differ; first at {i}:\n  oracle={a}\n  got   ={b}\n  sidecar={sc}")
                n_fail += 1; continue
            sc = check_sidecar(sfdir, outdir, name)
            if sc not in ("ok", "no-sidecar"):
                print(f"FAIL {name}: values match but sidecar says {sc} (stale/foreign artifact)")
                n_fail += 1; continue
            print(f"PASS {name} ({len(orn)} rows)"); n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
