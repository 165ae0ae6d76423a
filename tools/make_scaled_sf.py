"""Build a scaled-up bench dataset from an existing testdata sf dir.

The driver ships sf0.1 as the largest testdata; its 0.01->0.1 bench ratios
are dominated by fixed JVM/scan overheads, so shuffle-bound scaling is
invisible. This tool replicates a source sf dir N times (default 10, i.e.
~sf1: 6M lineitem rows) with join-consistent key shifts so every catalog
query still runs semantically unchanged — only bigger:

- dims ``region``/``nation`` are kept as-is (realistic: dims don't grow);
- entity tables (``customer supplier part orders lineitem events``) are
  unioned N times with primary/foreign keys shifted by ``replica * stride``
  (stride = max key + 1 of the source), preserving referential integrity
  within each replica;
- ``documents`` gets a per-replica text suffix (" r<i>") so replicas are
  NEAR-duplicates: MinHash/Jaccard/SimHash see a realistic duplicate-heavy
  corpus instead of degenerate exact copies;
- ``embeddings`` vectors are perturbed by ``replica * 1e-3`` per component
  so ANN queries see distinct-but-clustered points.

Writes parquet per table. Never touches /root/testdata (read-only).

Usage:
    python tools/make_scaled_sf.py [--src /root/testdata/sf0.1] \
        [--out /tmp/sfbench1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

ENTITY_KEYS = {
    # table -> (shift columns, key whose max defines the stride)
    "customer": (["c_custkey"], "c_custkey"),
    "supplier": (["s_suppkey"], "s_suppkey"),
    "part": (["p_partkey"], "p_partkey"),
    "orders": (["o_orderkey", "o_custkey"], None),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], None),
    "events": (["event_id", "user_id"], None),
}

# FK columns reuse the stride of the table that owns the key.
STRIDE_OWNER = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "events:user_id",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfbench1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    n = args.replicas

    def src(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    # strides: one per owning key so FKs shift consistently with their PK.
    strides: dict[str, int] = {}
    for t, key in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
                   ("part", "p_partkey"), ("orders", "o_orderkey"),
                   ("events", "event_id")):
        strides[t] = con.execute(f"SELECT max({key})+1 FROM {src(t)}").fetchone()[0]
    strides["events:user_id"] = con.execute(
        f"SELECT max(user_id)+1 FROM {src('events')}"
    ).fetchone()[0]

    def copy(sql: str, table: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {rows} rows")

    for t in ("region", "nation"):
        copy(f"SELECT * FROM {src(t)}", t)

    for t, (shift_cols, _) in ENTITY_KEYS.items():
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {src(t)}").fetchall()]
        select = []
        for c in cols:
            if c in shift_cols:
                stride = strides[STRIDE_OWNER[c]]
                select.append(f"{c} + r.rep * {stride} AS {c}")
            # NOTE: events.ts arrives as parquet TIMESTAMP(NANOS) and leaves
            # as TIMESTAMP_MICROS (DuckDB's widest parquet timestamp). The
            # engine's reader (schemas.load_table) normalizes both spellings
            # by dtype, and truncating nanos→micros matches the read path.
            else:
                select.append(c)
        copy(
            f"SELECT {', '.join(select)} FROM {src(t)}, "
            f"(SELECT unnest(range({n})) AS rep) r",
            t,
        )

    doc_stride = con.execute(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()[0]
    copy(
        f"""
        SELECT doc_id + r.rep * {doc_stride} AS doc_id,
               CASE WHEN r.rep = 0 THEN text ELSE text || ' r' || r.rep END AS text,
               lang, source,
               CASE WHEN r.rep = 0 THEN n_chars
                    ELSE n_chars + 2 + length(CAST(r.rep AS VARCHAR)) END AS n_chars
        FROM {src('documents')}, (SELECT unnest(range({n})) AS rep) r
        """,
        "documents",
    )

    vec_stride = con.execute(f"SELECT max(vec_id)+1 FROM {src('embeddings')}").fetchone()[0]
    copy(
        f"""
        SELECT vec_id + r.rep * {vec_stride} AS vec_id,
               list_transform(embedding, x -> CAST(x + r.rep * 0.001 AS FLOAT)) AS embedding,
               label
        FROM {src('embeddings')}, (SELECT unnest(range({n})) AS rep) r
        """,
        "embeddings",
    )


if __name__ == "__main__":
    main()
