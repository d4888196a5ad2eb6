"""Synthesize a larger scale factor from an existing one for scale
checkpoints (the driver ships sf0.001/0.01/0.1; SCALING.md wants an sf1
run). Facts are replicated ``mult`` times with consistent key offsets so
referential integrity (customer↔orders↔lineitem↔supplier↔part) and join/
agg cardinality shapes survive; dimension tables (region/nation) stay
fixed, as they would at any real scale. Copy 0 is byte-identical to the
source, so sf_out ⊇ sf_in.

Per-copy perturbations:
  - all synthetic keys offset by copy * 100M (BIGINT-safe)
  - documents.text gets a per-copy suffix token, which breaks EXACT
    duplicates across copies but NOT near-duplicates: one appended token
    leaves shingle Jaccard ≈0.97, so every replica group is a true
    near-dup clique and pair-output of minhash/simhash/jaccard queries
    grows ~quadratically in mult (C(mult,2) pairs per doc). That is
    result-cardinality growth, not plan cost — interpret dedup wall-times
    at synthesized sfs against their output size (see SCALING.md).
  - embeddings replicate as-is (scan/score cost is what the ANN/KNN
    benches measure; duplicated vectors don't change the plan shape)

Usage: python tools/make_sf.py [mult] [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 100_000_000

# table -> key columns to offset per copy
FACTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keys in FACTS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + i * {OFF} AS {c}")
            elif t == "documents" and c == "text":
                sel.append("text || CASE WHEN i = 0 THEN '' ELSE ' c' || i END AS text")
            elif t == "documents" and c == "n_chars":
                sel.append(
                    "n_chars + CASE WHEN i = 0 THEN 0 "
                    "ELSE length(' c' || i) END AS n_chars"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{src}/{t}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({mult})) AS i) copies) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
