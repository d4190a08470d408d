#!/usr/bin/env python3
"""Pair-wise re-verification of engine-reported similarity pairs.

The x25 (exact Jaccard) and x111 (asymmetric containment) oracle SQLs
deliberately mirror the reference-shaped candidate-join formulation for
checkability — which is quadratic-shaped for single-node DuckDB and
passes the CHECK_TIMEOUT_S cap at sf1+ corpus sizes (50k docs), while
the engine's blocked/capped Spark plans finish in seconds. This script
is the compensating evidence: it recomputes the similarity value IN
DUCKDB for exactly the pairs the engine reported (linear in pairs, not
docs²) and checks 4dp agreement plus the threshold.

It proves every reported pair is REAL; completeness (no missed pair) is
covered separately by the randomized brute-force equivalence properties
(RandomizedEquivalenceSpec) and the full hash-matches at
sf0.001/sf0.01/sf0.1.

Shingles replicate graft.ops.Dedup.docShingles: whitespace-split
tokens, distinct word 3-shingles, docs with < 3 tokens have none.

Usage:
  python3 tools/check_pairs.py jaccard     <pairs_parquet_dir> <documents.parquet>
  python3 tools/check_pairs.py containment <pairs_parquet_dir> <documents.parquet>

Exit code 0 iff every reported pair matches at 4dp and clears the
threshold.
"""
import sys

import duckdb

MODES = {
    # mode -> (src col, dst col, value col, threshold, denominator sql)
    "jaccard": ("doc_a", "doc_b", "jaccard", 0.5,
                "len(list_intersect(l.sh, r.sh))::DOUBLE"
                " / (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)))"),
    "containment": ("doc_src", "doc_dst", "containment", 0.8,
                    "len(list_intersect(l.sh, r.sh))::DOUBLE / len(l.sh)"),
}


def main(mode: str, pairs_dir: str, docs_parquet: str) -> int:
    a, b, val, thr, expr = MODES[mode]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW pairs AS SELECT * FROM read_parquet('{pairs_dir}/*.parquet')")
    n_pairs = con.execute("SELECT count(*) FROM pairs").fetchone()[0]
    row = con.execute(f"""
WITH need AS (SELECT DISTINCT doc_id
              FROM (SELECT {a} AS doc_id FROM pairs UNION SELECT {b} FROM pairs)),
tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS toks
  FROM read_parquet('{docs_parquet}') SEMI JOIN need USING (doc_id)),
dsh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i+1:i+3], ' ')
                                  for i in range(0, len(toks) - 2)])
              ELSE [] END AS sh
  FROM tok),
chk AS (
  SELECT p.{val} AS got,
         floor(({expr}) * 10000 + 0.5) / 10000 AS want
  FROM pairs p JOIN dsh l ON l.doc_id = p.{a}
               JOIN dsh r ON r.doc_id = p.{b})
SELECT count(*),
       sum(CASE WHEN got = want THEN 1 ELSE 0 END),
       sum(CASE WHEN want >= {thr} THEN 1 ELSE 0 END)
FROM chk""").fetchone()
    n, match, above = row
    print(f"{mode}: {n_pairs} engine pairs, {n} joined, "
          f"{int(match or 0)} exact 4dp matches, {int(above or 0)} >= {thr}")
    ok = n == n_pairs and match == n and above == n
    print("PAIRWISE OK" if ok else "PAIRWISE FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) != 4 or sys.argv[1] not in MODES:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
