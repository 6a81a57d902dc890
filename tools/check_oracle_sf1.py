#!/usr/bin/env python3
"""sf1 correctness sweep (VERDICT r15 #6) — the correctness complement
of BENCH_sf1: run every oracle at sf1 and hash-compare against the
sf1 Verify artifacts, producing CORRECTNESS_sf1.json.

Same compare as check_oracle.py, but each oracle runs in its own
forked subprocess with a wall timeout: a handful of oracles are
O(n^2) in DuckDB BY DESIGN (brute-force replays whose Spark twin is
the thing under test), and at sf1 those must be excluded LOUDLY
(status oracle-timeout, logged in the artifact) instead of hanging
the sweep. Queries excluded from the Spark-side Verify run (the nine
BENCH_sf1 O(n^2) baselines) surface as status "excluded" with the
reason recorded.

Usage: check_oracle_sf1.py <sfdir> <outdir> <artifact.json> [timeout_s]
"""
import json, multiprocessing as mp, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, norm, check_sidecar  # noqa: E402


def run_one(sfdir, outdir, name, sql, q):
    try:
        import duckdb
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sfdir}/{t}.parquet')")
        PORTABLE = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
                    "TIMESTAMP", "TIMESTAMP_NS", "INTEGER"}
        exotic = [(r[0], r[1])
                  for r in con.execute(f"DESCRIBE {sql}").fetchall()
                  if r[1] not in PORTABLE]
        if exotic:
            q.put(("fail", f"non-portable types {exotic}", 0)); return
        cur = con.execute(sql)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        gcur = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        gcols = [d[0] for d in gcur.description]
        grows = gcur.fetchall()
        oc, orn = norm(orows, ocols)
        gc, grn = norm(grows, gcols)
        if oc != gc:
            q.put(("fail", f"columns oracle={oc} got={gc}", 0)); return
        if len(orn) != len(grn):
            q.put(("fail", f"rows oracle={len(orn)} got={len(grn)}", 0)); return
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orn, grn)) if a != b]
        if bad:
            i, a, b = bad[0]
            q.put(("fail",
                   f"{len(bad)}/{len(orn)} rows differ; first at {i}: "
                   f"oracle={a} got={b}", len(orn)))
            return
        sc = check_sidecar(sfdir, outdir, name)
        if sc not in ("ok", "no-sidecar"):
            q.put(("fail", f"sidecar says {sc}", len(orn))); return
        q.put(("pass", "", len(orn)))
    except Exception as e:  # noqa: BLE001
        q.put(("error", str(e)[:500], 0))


def main():
    sfdir, outdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    full = f"{outdir}/oracle_sql_full.json"
    oracle = json.load(open(full if os.path.exists(full)
                            else f"{outdir}/oracle_sql.json"))
    results, order = {}, sorted(oracle)
    for name in order:
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            results[name] = {
                "status": "excluded",
                "detail": "not produced by the sf1 Verify run "
                          "(SPARK_GRAFT_VERIFY_EXCLUDE: O(n^2)-by-design "
                          "brute-force oracle baseline)"}
            print(f"EXCLUDED {name} (no sf1 artifact)")
            continue
        t0 = time.time()
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sfdir, outdir, name, oracle[name], q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            results[name] = {
                "status": "oracle-timeout",
                "detail": f"DuckDB replay exceeded {timeout}s at sf1 "
                          "(oracle-side cost, not a Spark-path failure)"}
            print(f"TIMEOUT {name} (> {timeout}s)")
            continue
        status, detail, rows = q.get() if not q.empty() else (
            "error", "subprocess died without a result", 0)
        results[name] = {"status": status, "rows": rows,
                         "seconds": round(time.time() - t0, 1)}
        if detail:
            results[name]["detail"] = detail
        print(f"{status.upper()} {name} ({rows} rows, "
              f"{results[name].get('seconds', '?')}s)")
    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    summary = {"sf_dir": sfdir, "out_dir": outdir,
               "timeout_s": timeout, "counts": counts,
               "queries": results}
    json.dump(summary, open(artifact, "w"), indent=1)
    print(f"== {counts}")
    return 1 if counts.get("fail", 0) or counts.get("error", 0) else 0


if __name__ == "__main__":
    sys.exit(main())
