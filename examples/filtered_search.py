"""Attribute-filtered search walkthrough (Milvus boolean-expr analog).

The reference's Milvus backend exposes boolean expressions over scalar
fields but the app only ever issues the trivial `id >= 0`; here filters
are first-class and cost nothing extra (the expression mask replaces the
tombstone mask inside the same masked device scan — ARCHITECTURE.md).
Runs self-contained on the CPU mesh in a few seconds:

    python examples/filtered_search.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    rng = np.random.default_rng(0)

    # 1) Index with scalar attribute columns (nullable — any insert may
    #    carry any subset of fields; missing values match only != / not in).
    from image_retrieval_tpu.config import IndexConfig
    from image_retrieval_tpu.index import ShardedVectorIndex

    n, d = 600, 64
    emb = rng.normal(size=(n, d)).astype(np.float32)
    colors = ["red", "green", "blue"]
    idx = ShardedVectorIndex(dim=d, config=IndexConfig(capacity_step=128))
    idx.insert(
        [f"img_{i}.jpg" for i in range(n)],
        emb,
        attrs={
            "color": [colors[i % 3] for i in range(n)],
            "views": [int(i * 7 % 1000) for i in range(n)],
            "nsfw": [bool(i % 50 == 0) for i in range(n)],
        },
    )
    print(f"[1] indexed {len(idx)} rows with fields {idx.attrs.fields}")

    # 2) Filtered exact search: the expression is parsed once, evaluated
    #    vectorized into one bool mask, and rides the tombstone masked scan.
    q = rng.normal(size=(d,)).astype(np.float32)
    expr = "color == 'red' and views >= 100 and not nsfw == true"
    vals, ids = idx.search(q, top_k=5, flt=expr)
    print(f"[2] {expr!r}: rows {[int(i) for i in ids if i >= 0]}")

    # 3) in / not in, or, parens — and delete-by-expression.
    vals, ids = idx.search(
        q, top_k=5, flt="color in ['red', 'blue'] or views < 10"
    )
    print(f"[3] compound expr: rows {[int(i) for i in ids if i >= 0]}")
    removed = idx.delete_where("nsfw == true")
    print(f"[3] delete_where('nsfw == true') tombstoned {removed} rows")

    # 4) The pymilvus-style shim exposes the same exprs (plus virtual
    #    id/image_path) on search/query/delete — Milvus code ports as-is.
    from image_retrieval_tpu.index.compat import Collection

    col = Collection("demo", dim=d)
    mags = np.linalg.norm(emb[:20], axis=1)
    col.insert(
        [[f"p{i}.jpg" for i in range(20)], emb[:20] / mags[:, None], mags],
        attrs={"cat": ["dog" if i % 2 else "cat" for i in range(20)]},
    )
    rows = col.query(expr="cat == 'dog' and id < 10",
                     output_fields=["image_path"])
    print(f"[4] shim query: {[r['image_path'] for r in rows]}")
    hits = col.search([emb[0] / np.linalg.norm(emb[0])], limit=3,
                      expr="cat == 'cat'")[0]
    print(f"[4] shim filtered search: "
          f"{[h.entity.get('image_path') for h in hits]}")

    # 5) The facade auto-attaches dir = parent directory name, so category
    #    trees filter out of the box:
    #      app.search_images("a red thing", filter_expr="dir == 'red'")
    #    (CLI: search --filter "dir == 'red'"; web UI: the filter box.)
    print("[5] facade/CLI/web UI: filter_expr / --filter / filter box")


if __name__ == "__main__":
    main()
