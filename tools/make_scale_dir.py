"""Synthesize a scaled-up sf directory from an existing one (scale soak).

The driver only ships sf<=0.1; the 100 TB posture needs at least one
measured point an order of magnitude up. This replicates the FACT tables
(orders, lineitem, events, documents, embeddings) ``factor`` times with
key shifts that keep referential joins valid (dimension tables are copied
unchanged — exactly how a real warehouse scales: facts grow, dims don't).
Document text gets a per-replica marker token prepended so replicas are
near- but not exact duplicates (otherwise every dedup query degenerates
to clique explosion instead of realistic near-dup load).

Usage: python tools/make_scale_dir.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sfscale 10
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

DIMS = ("region", "nation", "customer", "supplier", "part")


FACTS = ("orders", "lineitem", "events", "documents", "embeddings")


def make_scale_dir(
    src: str, dst: str, factor: int, facts: tuple = FACTS, copy_dims: bool = True
) -> None:
    """``facts`` restricts which fact tables are replicated (the deep
    dedup/ANN soak only needs documents/embeddings — replicating the
    TPC-H facts 100x would waste most of the build time); ``copy_dims``
    skips the dimension copies for the same reason."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    if copy_dims:
        for t in DIMS:
            shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    def scale(table: str, select_template: str) -> None:
        selects = " UNION ALL ".join(
            select_template.format(i=i) for i in range(factor)
        )
        con.sql(
            f"COPY ({selects}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )

    if "orders" in facts or "lineitem" in facts:
        o_shift = con.sql(
            f"SELECT max(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')"
        ).fetchone()[0]
    if "orders" in facts:
        scale(
            "orders",
            f"SELECT o_orderkey + {{i}} * {o_shift} AS o_orderkey, "
            f"* EXCLUDE (o_orderkey) FROM read_parquet('{src}/orders.parquet')",
        )
    if "lineitem" in facts:
        scale(
            "lineitem",
            f"SELECT l_orderkey + {{i}} * {o_shift} AS l_orderkey, "
            f"* EXCLUDE (l_orderkey) FROM read_parquet('{src}/lineitem.parquet')",
        )
    if "events" in facts:
        e_shift = con.sql(
            f"SELECT max(event_id) + 1 FROM read_parquet('{src}/events.parquet')"
        ).fetchone()[0]
        scale(
            "events",
            f"SELECT event_id + {{i}} * {e_shift} AS event_id, "
            f"* EXCLUDE (event_id) FROM read_parquet('{src}/events.parquet')",
        )
    if "documents" in facts:
        d_shift = con.sql(
            f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')"
        ).fetchone()[0]
        scale(
            "documents",
            f"SELECT doc_id + {{i}} * {d_shift} AS doc_id, "
            f"CASE WHEN {{i}} = 0 THEN text ELSE 'r{{i}} ' || text END AS text, "
            f"* EXCLUDE (doc_id, text) FROM read_parquet('{src}/documents.parquet')",
        )
    if "embeddings" in facts:
        v_shift = con.sql(
            f"SELECT max(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')"
        ).fetchone()[0]
        scale(
            "embeddings",
            f"SELECT vec_id + {{i}} * {v_shift} AS vec_id, "
            f"* EXCLUDE (vec_id) FROM read_parquet('{src}/embeddings.parquet')",
        )
    con.close()


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_scale_dir(src, dst, factor)
    for f in sorted(os.listdir(dst)):
        print(f, round(os.path.getsize(os.path.join(dst, f)) / 1e6, 1), "MB")
