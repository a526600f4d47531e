#!/usr/bin/env python3
"""Scale the driver testdata by replicating a source sf directory R
times with consistent key offsets (FKs offset together, dimension
tables fixed), preserving parquet schemas exactly (incl. the events
TIMESTAMP(NANOS) ts). Perf-scaling tool only — correctness stays on
the driver-generated sf dirs.

Usage: python3 tools/make_sfN.py [src_dir] [dst_dir] [replicas]
"""
import math, os, sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> columns to offset per replica (None = copy once, unscaled)
OFFSET_COLS = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

os.makedirs(DST, exist_ok=True)

# shared offset modulus per key family so FKs stay consistent
def modulus(*vals):
    m = max(vals) + 1
    return 10 ** math.ceil(math.log10(max(m, 10)))

tabs = {t: pq.read_table(f"{SRC}/{t}.parquet") for t in OFFSET_COLS}
mod = {}
for fam, pairs in {
    "cust": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "order": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}.items():
    m = modulus(*(pc.max(tabs[t][c]).as_py() for t, c in pairs))
    for t, c in pairs:
        mod[(t, c)] = m

for t, cols in OFFSET_COLS.items():
    src = tabs[t]
    if cols is None:
        out = src
    else:
        reps = []
        for r in range(R):
            rep = src
            for c in cols:
                idx = rep.schema.get_field_index(c)
                typ = rep.schema.field(idx).type
                shifted = pc.cast(
                    pc.add(rep[c], pa.scalar(r * mod[(t, c)], type=typ)), typ)
                rep = rep.set_column(idx, rep.schema.field(idx), shifted)
            reps.append(rep)
        out = pa.concat_tables(reps)
    pq.write_table(out, f"{DST}/{t}.parquet", compression="snappy")
    print(f"{t}: {src.num_rows} -> {out.num_rows}")
