"""Generate a scaled measurement tier by deterministic K-fold replication
of an existing driver testdata tier (default: sf0.1 x 10 -> sf1.0).

Each replica shifts every key column by replica * (max_key + 1) of its key
domain, consistently across fact/dim tables, so foreign keys stay valid and
per-key group sizes scale exactly like a TPC-H-style scale-factor bump
(row counts x K, same time window, K-fold density). Non-key payload columns
are copied verbatim: distributions (dup structure, tile occupancy, text
content) are preserved, which is what makes the quadratic operators
(co_visitation, knox_stat, lsh_candidate_pairs) land at realistic sf1 cost.

Measurement-only: never read by bench.py or any registry query; the driver
generates its own sf tiers. Usage:

  python tools/gen_scaled_sf.py [--src /root/testdata/sf0.1] \
      [--dst /root/sfgen/sf1.0] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key domain -> (table, column) members; every member shifts by the same
# replica * (domain max + 1) so FKs remain consistent across tables
DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "userkey": [("events", "user_id")],
    "eventkey": [("events", "event_id")],
    "dockey": [("documents", "doc_id")],
    "veckey": [("embeddings", "vec_id")],
}

# dimension tables that do NOT scale with sf (copied once, unshifted)
FIXED = {"region", "nation"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/sfgen/sf1.0")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    tables = [
        f[: -len(".parquet")]
        for f in sorted(os.listdir(args.src))
        if f.endswith(".parquet")
    ]

    # pass 1: domain maxima from the source tier
    shift_base: dict[str, int] = {}
    for dom, members in DOMAINS.items():
        hi = 0
        for tbl, col in members:
            if tbl not in tables:
                continue
            t = pq.read_table(os.path.join(args.src, f"{tbl}.parquet"), columns=[col])
            hi = max(hi, pc.max(t[col]).as_py() or 0)
        shift_base[dom] = hi + 1

    col_domain = {(tbl, col): dom for dom, ms in DOMAINS.items() for tbl, col in ms}

    for tbl in tables:
        src = pq.read_table(os.path.join(args.src, f"{tbl}.parquet"))
        out = os.path.join(args.dst, f"{tbl}.parquet")
        if tbl in FIXED:
            pq.write_table(src, out)
            print(f"{tbl}: copied ({src.num_rows} rows)")
            continue
        reps = []
        for r in range(args.k):
            rep = src
            for ci, name in enumerate(src.column_names):
                dom = col_domain.get((tbl, name))
                if dom is None or r == 0:
                    continue
                shifted = pc.add(src[name], r * shift_base[dom])
                rep = rep.set_column(ci, name, shifted.cast(src.schema.field(name).type))
            reps.append(rep)
        big = pa.concat_tables(reps)
        pq.write_table(big, out, row_group_size=1 << 20)
        print(f"{tbl}: {src.num_rows} -> {big.num_rows} rows")

    open(os.path.join(args.dst, "_DONE"), "w").close()
    print(f"done: {args.dst}")


if __name__ == "__main__":
    main()
