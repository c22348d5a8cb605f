"""Deterministic testdata scale-up: tile an sf directory N× into a new
directory, preserving each query's *scaling shape* so bench numbers at the
larger scale are meaningful.

Plain row duplication would be wrong for two table families:

  - documents: copies of a text are exact/near dups, so every dup cluster
    would grow N× and LSH pair output would grow N² — not how a bigger
    corpus behaves.  Replica r > 0 salts every token with "~r", which
    keeps all within-replica shingle structure identical (same clusters,
    same jaccards) while making cross-replica shingles disjoint: clusters
    scale linearly, as a real corpus does.
  - embeddings: copied vectors have cosine 1.0 across replicas.  Replica
    r > 0 applies a signed coordinate permutation (an orthogonal map, so
    all within-replica cosines are bit-preserved) drawn from seed r;
    cross-replica cosines become ~N(0, 1/sqrt(dim)) — far below any
    near-dup threshold — so neardup pairs scale linearly and brute-force
    k-NN keeps its top-k structure per replica.

Fact/key tables shift ids by replica*stride with consistent FK shifts
(orders.o_custkey moves with customer, lineitem.l_orderkey with orders,
…).  Fixed dimensions (region, nation) are not tiled, matching TPC-H,
whose scalable tables grow with sf while region/nation stay constant.
events keeps its timestamp range (denser traffic, the TPC-H convention)
and whatever physical ts type the source vintage uses (the schema is
passed through unchanged; parquet format version 2.6).

Usage: python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Logical entity -> every (table, column) that carries it, parent key and
# child FKs alike.  The stride for an entity is max over ALL its carriers
# (a dangling FK beyond the parent's max must still not collide after the
# shift), and every carrier column shifts by that same stride — this is
# what keeps replica-r orders pointing at replica-r customers.
ENTITIES = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
COPY_ONLY = ["region", "nation"]
TILED = ["customer", "supplier", "part", "orders", "lineitem", "events",
         "documents", "embeddings"]

def _strides(tables: dict[str, pa.Table]) -> dict[str, dict[str, int]]:
    """Per-table {column: stride}: the stride of the entity it carries.

    Carriers missing from the source dir (table absent, or column dropped
    by a testdata refresh) are skipped rather than KeyError-ing; a shared
    entity still strides by the max over its present carriers."""
    out: dict[str, dict[str, int]] = {t: {} for t in TILED}
    for carriers in ENTITIES.values():
        present = [
            (t, col)
            for t, col in carriers
            if t in tables and col in tables[t].column_names
        ]
        missing = [tc for tc in carriers if tc not in present]
        if missing:
            print(f"warning: skipping absent carriers {missing}")
        m = 0
        for t, col in present:
            m = max(m, pa.compute.max(tables[t][col]).as_py() or 0)
        for t, col in present:
            out[t][col] = m + 1
    return out

def _salt_text(col: pa.ChunkedArray, r: int) -> pa.Array:
    texts = col.to_pylist()
    salted = [
        None if t is None else " ".join(f"{w}~{r}" for w in t.split())
        for t in texts
    ]
    return pa.array(salted, type=pa.string())

def _rotate_embeddings(col: pa.ChunkedArray, r: int) -> pa.Array:
    vecs = col.to_pylist()
    dim = len(next(v for v in vecs if v))
    rng = np.random.default_rng(r)
    perm = rng.permutation(dim)
    signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
    mat = np.array(vecs, dtype=np.float32)
    rot = mat[:, perm] * signs
    return pa.array(list(rot), type=pa.list_(pa.float32()))

def replica(
    name: str, tab: pa.Table, r: int, strides: dict[str, dict[str, int]]
) -> pa.Table:
    if r == 0:
        return tab
    shifts = strides[name]
    cols = {}
    for cname in tab.column_names:
        col = tab[cname]
        if cname in shifts:
            shifted = pa.compute.add(col, pa.scalar(r * shifts[cname], type=pa.int64()))
            cols[cname] = shifted.cast(col.type)
        elif name == "documents" and cname == "text":
            cols[cname] = _salt_text(col, r)
        elif name == "embeddings" and cname == "embedding":
            cols[cname] = _rotate_embeddings(col, r)
        else:
            cols[cname] = col
    return pa.table(cols, schema=tab.schema)

def main() -> None:
    src, dst, n = Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3])
    dst.mkdir(parents=True, exist_ok=True)
    tables = {
        p.stem: pq.read_table(p) for p in sorted(src.glob("*.parquet"))
    }
    absent = [t for t in COPY_ONLY + TILED if t not in tables]
    if absent:
        sys.exit(f"error: {src} is missing tables {absent}")
    strides = _strides(tables)
    for name in COPY_ONLY:
        pq.write_table(tables[name], dst / f"{name}.parquet", version="2.6")
        print(f"{name}: copied ({tables[name].num_rows})")
    for name in TILED:
        tab = tables[name]
        tiled = pa.concat_tables(
            [replica(name, tab, r, strides) for r in range(n)]
        )
        # bounded row groups: pyarrow's default can emit the whole tile
        # as ONE row group, which Spark cannot split — every scan of the
        # scaled table would run on one core and the benchmark would
        # measure the file layout, not the engine.  One row group per
        # source-sized tile mirrors how a real corpus ships (many
        # files/row groups).
        pq.write_table(
            tiled,
            dst / f"{name}.parquet",
            version="2.6",
            row_group_size=max(tab.num_rows, 10_000),
        )
        print(f"{name}: {tab.num_rows} -> {tiled.num_rows}")

if __name__ == "__main__":
    main()
