"""Scale the driver's sf0.1 test data 10x to an sf1 tier for benching.

The driver ships sf{0.001,0.01,0.1}; at sf0.1 every headline query is
dominated by Spark's fixed per-job floor (~0.13-0.3 s), so the 2x-of-DuckDB
bench gate is unmeasurable there (VERDICT r1). This tool materializes
/root/repo/testdata_sf1 (gitignored) by replicating sf0.1 ten times with
FK-consistent key offsets:

- fact/entity surrogate keys shift by replica * (max(key)+1), so joins stay
  1:1-correct and uniqueness invariants hold at 10x the rows;
- dimension tables (region, nation) and non-key attributes copy unchanged;
- schemas are preserved EXACTLY (pyarrow round-trip, including the
  timestamp[ns] events.ts the engine special-cases).

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [replicas]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: table -> columns to offset by (replica * stride(owning table key)).
#: Strides come from the key's OWN table so FKs stay aligned.
OFFSET_COLS: dict[str, list[tuple[str, str, str]]] = {
    # (column, stride_table, stride_col)
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "events": [("event_id", "events", "event_id")],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}

COPY_TABLES = ["region", "nation"]


def _perturb_texts(texts: list[str | None], replica: int) -> list[str | None]:
    """Deterministic per-replica text edits so scaled documents are NOT
    verbatim copies of the base tier. Plain replication gives every doc
    `replicas` exact twins, which makes near-dup candidate pairs (and the
    minhash bench) grow quadratically in the replication factor — an
    artifact no real corpus has (VERDICT r1 / ROUND_NOTES). Instead each
    replica doc is either a NEAR-DUP of its base (every 20th word swapped —
    survives MinHash banding like real boilerplate dupes) or DISTINCT
    (every word tagged with the replica id, so no shingles are shared).
    The near-dup rate is long-tailed like a real post-exact-dedup corpus:
    10% of replicas for most docs, 50% for the 1-in-97 "boilerplate" docs —
    so cluster sizes grow with the tier but stay dominated by small
    clusters, with a few heavy cliques exercising the skew guards.
    n_chars is left as the base doc's value: it is a free-form metadata
    column and the quality/stats queries compute from `text` itself."""
    out: list[str | None] = []
    for i, text in enumerate(texts):
        if text is None:
            out.append(None)
            continue
        words = text.split(" ")
        near_dup_pct = 50 if i % 97 == 0 else 10
        if (i * 2654435761 + replica * 40503) % 100 < near_dup_pct:
            words = [
                f"r{replica}w{i % 7}" if j % 20 == 19 else w
                for j, w in enumerate(words)
            ]
        else:
            words = [f"{w}{replica}" for w in words]
        out.append(" ".join(words))
    return out


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1")
    replicas = int(sys.argv[3] if len(sys.argv) > 3 else 10)
    dst.mkdir(parents=True, exist_ok=True)

    tables = {
        t: pq.read_table(src / f"{t}.parquet")
        for t in COPY_TABLES + list(OFFSET_COLS)
    }
    strides = {
        (st, sc): pc.max(tables[st][sc]).as_py() + 1
        for cols in OFFSET_COLS.values()
        for (_, st, sc) in cols
    }

    for t in COPY_TABLES:
        pq.write_table(tables[t], dst / f"{t}.parquet")
        print(f"{t}: copied {tables[t].num_rows} rows")

    for t, cols in OFFSET_COLS.items():
        base = tables[t]
        chunks = []
        for r in range(replicas):
            tbl = base
            for col, st, sc in cols:
                typ = tbl.schema.field(col).type
                shifted = pc.cast(
                    pc.add(tbl[col], strides[(st, sc)] * r), typ
                )
                tbl = tbl.set_column(
                    tbl.schema.get_field_index(col), tbl.schema.field(col), shifted
                )
            if t == "documents" and r > 0:
                idx = tbl.schema.get_field_index("text")
                perturbed = pa.array(
                    _perturb_texts(tbl["text"].to_pylist(), r),
                    type=tbl.schema.field("text").type,
                )
                tbl = tbl.set_column(idx, tbl.schema.field("text"), perturbed)
            chunks.append(tbl)
        out = pa.concat_tables(chunks)
        # Bound row-group size: pyarrow's default (~1M rows/group) gives a
        # 500k-row documents table ONE row group, and Spark's scan splits
        # can't cut inside a row group — every text query ran single-task
        # at sf10. ~128 groups ≈ full local parallelism with groups still
        # MB-scale.
        pq.write_table(
            out, dst / f"{t}.parquet",
            row_group_size=max(5000, out.num_rows // 128),
        )
        assert out.schema.equals(base.schema), f"schema drift in {t}"
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
