#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from `<outdir>/oracle_sql.json` in DuckDB against the
parquet fixtures, loads the Spark result parquet from `<outdir>/<name>/`,
sorts columns by name and rows by all columns, and hash-compares.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 target/verify_out [record.json]

The optional third argument writes a per-query record in the driver's
CORRECTNESS format (rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err) — used to commit the builder's own
sf0.1 pass as an in-repo artifact (CORRECTNESS_SELF_sf0.1.json).
"""
import sys, os, json, glob, hashlib, threading
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> tuple:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to strings the same way for both engines
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return ""
        if isinstance(v, float):
            return repr(round(v, 6))
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = sorted(",".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)


def main(sfdir: str, outdir: str, record_path: str | None = None) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    record = {}
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result")
            record[name] = dict(rows_match=None, schema_match=None, hash_match=None,
                                spark_rows=None, oracle_rows=None, err="no spark result")
            fails += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        # Builder-side scale runs only (CHECK_TIMEOUT_S env): interrupt
        # an oracle that outruns the budget and record it as such — at
        # sf1 a few of the pair-mining oracles are quadratic for DuckDB
        # even though the engine side finished; that asymmetry is the
        # record, not a silent hang. The driver's own sf0.01 gate sets
        # no timeout and is unaffected.
        timeout_s = float(os.environ.get("CHECK_TIMEOUT_S", "0") or 0)
        timer = None
        if timeout_s > 0:
            timer = threading.Timer(timeout_s, con.interrupt)
            timer.start()
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            interrupted = timer is not None and not timer.is_alive()
            if interrupted and "INTERRUPT" in str(e).upper():
                # N/A BY DESIGN, not a failure (VERDICT r12, finding 4):
                # the engine side finished (spark_rows recorded); it is
                # the mirrored ORACLE that cannot run at this SF — e.g.
                # x25's all-pairs SQL is quadratic for DuckDB while the
                # engine's prefix-filtered join scales. The row is
                # recorded distinctly so a ledger reads green-or-N/A,
                # never ambiguous.
                msg = (f"N/A by design: oracle exceeded {timeout_s:.0f}s at this "
                       f"SF (engine side finished; scale-asymmetric oracle)")
                print(f"n/a  {name}: {msg}")
                record[name] = dict(rows_match=None, schema_match=None,
                                    hash_match=None, spark_rows=len(spark_df),
                                    oracle_rows=None, err=None,
                                    na_by_design=msg)
                continue
            msg = f"duckdb error: {e}"
            print(f"FAIL {name}: {msg}")
            record[name] = dict(rows_match=None, schema_match=None, hash_match=None,
                                spark_rows=len(spark_df), oracle_rows=None, err=msg)
            fails += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
        sh, sn = canon(spark_df)
        dh, dn = canon(duck_df)
        ok = sh == dh
        schema_ok = sorted(spark_df.columns) == sorted(duck_df.columns)
        record[name] = dict(rows_match=sn == dn, schema_match=schema_ok,
                            hash_match=ok, spark_rows=sn, oracle_rows=dn, err=None)
        # dtype strictness: int32-vs-int64 style mismatches may fail the
        # driver's schema compare even when values hash-match
        dt_s = {c: str(spark_df[c].dtype) for c in spark_df.columns}
        dt_d = {c: str(duck_df[c].dtype) for c in duck_df.columns}
        dt_diff = {c: (dt_s.get(c), dt_d.get(c)) for c in set(dt_s) | set(dt_d)
                   if dt_s.get(c) != dt_d.get(c)}
        if ok and dt_diff:
            print(f"WARN {name}: dtype mismatch {dt_diff}")
        if not ok:
            fails += 1
            print(f"FAIL {name}: rows {sn} vs {dn}, schema_match={schema_ok} "
                  f"cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        else:
            print(f"ok   {name}: {sn} rows")
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
    if record_path:
        with open(record_path, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True)
        print(f"record written to {record_path}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
