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

``--plant-gopher N`` (opt-in; default off so the default output stays
byte-identical to every committed correctness/bench record) rewrites
every Nth document — by FINAL tiled doc_id, after replica salting — into
a deterministic document that passes all Gopher A1.1 quality bounds
(≥50 words, 3–10 mean token length, ≥2 distinct stopwords, no symbol/
bullet/ellipsis/repetition excess) and ends with two boilerplate lines
shared across ALL planted docs.  This gives corpus-pipeline e2e runs a
fixture where the quality gate and the cross-doc line dedup both select
strictly inside (0,1): the synthetic base corpus fails MIN_WORDS
wholesale, so without planting those two stages demonstrate nothing.
Use a SEPARATE output dir for planted runs — planted text changes every
document-derived digest.
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

# Shared tail lines for planted Gopher docs: web boilerplate that
# cross-doc line dedup (C4) should strip from all but the first doc.
GOPHER_BOILERPLATE = [
    "share this page with a friend and subscribe to the weekly letter",
    "all rights in this page belong to the original author of the text",
]

_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]

def _gopher_pool() -> tuple[list[str], np.ndarray]:
    """A fixed 1000-word vocabulary (deterministic 4-8 letter strings)
    with Zipf weights.  Shared across planted docs so a self-trained
    bigram LM has learnable mass and per-doc perplexity VARIES (head-
    heavy docs score low, tail-heavy high) — the property the corpus
    pipeline's LM filter needs to select fractionally.  Two docs share
    a specific 3-token shingle with ~0 probability, so the pool adds no
    accidental near-dup pairs."""
    rng = np.random.default_rng(20260817)
    pool = [
        "".join(chr(97 + int(c)) for c in rng.integers(0, 26, size=int(rng.integers(4, 9))))
        for _ in range(1000)
    ]
    w = 1.0 / np.arange(1, 1001, dtype=np.float64)
    return pool, w / w.sum()

def _gopher_body(rng: np.random.Generator, pool: list[str], pw: np.ndarray) -> list[str]:
    """90 tokens as 3 paragraphs of ONE 30-token line each: every 3rd
    token a stopword (never adjacent — no dominant n-gram), the rest
    Zipf draws from the shared pool.  Long lines matter: a near-dup
    partner mutates one token PER LINE, so no complete line is shared
    (cross-doc line dedup must not gut a pair member below MIN_WORDS)
    while 3-shingle jaccard stays ~(30-3)/(30+3) per line ~ 0.8, inside
    the 4-row/4-band MinHash catch band.  Returns the flat token list;
    the caller formats lines/paragraphs."""
    fillers = rng.choice(len(pool), size=60, p=pw)
    stops = rng.integers(len(_GOPHER_STOPS), size=30)
    toks, fi, si = [], 0, 0
    for p in range(90):
        if p % 3 == 2:
            toks.append(_GOPHER_STOPS[int(stops[si])])
            si += 1
        else:
            toks.append(pool[int(fillers[fi])])
            fi += 1
    return toks

def _fmt_gopher(toks: list[str]) -> str:
    paras = [" ".join(toks[i : i + 30]) for i in range(0, 90, 30)]
    # fixed prefix guarantees >= 2 distinct stopwords deterministically
    return "the of " + "\n\n".join(paras) + "\n" + "\n".join(GOPHER_BOILERPLATE)

def plant_gopher_docs(tab: pa.Table, every: int) -> pa.Table:
    """Rewrite every ``every``-th doc (by doc_id) into a Gopher-passing
    document: 92 words > MIN_WORDS, ~1/3 stopwords, Zipf pool fillers
    (see `_gopher_pool`), mean token length ~5 in [3,10], zero symbols/
    bullets/ellipses, all lines and paragraphs distinct within the doc,
    plus the shared GOPHER_BOILERPLATE tail.  The body passes the
    quality bounds on its own, so docs still pass after line dedup
    strips the boilerplate.

    Every 2nd planted doc (doc_id % (2*every) == 0) is a NEAR-DUP of
    the planted doc at doc_id+every: same body with 3 filler tokens
    re-drawn (3-shingle jaccard ~0.82, so a 4-row/4-band MinHash
    catches the pair w.p. ~0.9) — so an LSH component pass over ONLY
    the planted subpopulation still has >0 pairs to collapse even
    after the LM/DSIR stages thin the pair population, which is what
    lets a drop_low_quality corpus run show fractional selectivity at
    the near-dup stage too."""
    pool, pw = _gopher_pool()
    ids = tab["doc_id"].to_pylist()
    texts = tab["text"].to_pylist()
    for i, (did, t) in enumerate(zip(ids, texts)):
        if t is None or did % every:
            continue
        if did % (2 * every) == 0:
            # near-dup of the doc seeded by did+every: re-draw ONE
            # filler token in EACH 30-token line (see _gopher_body)
            base = np.random.default_rng(did + every)
            toks = _gopher_body(base, pool, pw)
            mut = np.random.default_rng(did)
            repl = mut.choice(len(pool), size=3, p=pw)
            for line in range(3):
                fillers_in_line = [
                    p for p in range(line * 30, line * 30 + 30) if p % 3 != 2
                ]
                pos = fillers_in_line[int(mut.integers(len(fillers_in_line)))]
                toks[pos] = pool[int(repl[line])]
            texts[i] = _fmt_gopher(toks)
        else:
            rng = np.random.default_rng(did)
            texts[i] = _fmt_gopher(_gopher_body(rng, pool, pw))
    cols = {
        c: (pa.array(texts, type=pa.string()) if c == "text" else tab[c])
        for c in tab.column_names
    }
    return pa.table(cols, schema=tab.schema)

def main() -> None:
    argv = list(sys.argv[1:])
    plant_every = 0
    for a in list(argv):
        if a.startswith("--plant-gopher"):
            plant_every = int(a.split("=", 1)[1]) if "=" in a else int(
                argv[argv.index(a) + 1]
            )
            if "=" not in a:
                argv.remove(argv[argv.index(a) + 1])
            argv.remove(a)
    src, dst, n = Path(argv[0]), Path(argv[1]), int(argv[2])
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
        if name == "documents" and plant_every:
            tiled = plant_gopher_docs(tiled, plant_every)
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
