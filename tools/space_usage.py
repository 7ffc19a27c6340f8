"""Index space-usage report (reference: inspect.rs:40-77 — the
`tantivy inspect` per-structure byte report).

Usage:
    python tools/space_usage.py <artifact_or_segmented_root>

Accepts either a single committed artifact dir (manifest.json) or a
segmented root (SEGMENTS.json); prints per-segment bytes by structure
(blocks / term_stats / doc_stats / deletes / doc_store) plus totals.
Pure driver-side filesystem metadata — no Spark job runs; the same
numbers feed SegmentedIndex.merge_candidates(size_by='bytes').
"""

from __future__ import annotations

import json
import os
import sys


def _artifact_usage(path: str) -> dict:
    out = {}
    for sub in ["blocks", "term_stats", "doc_stats", "deletes",
                "doc_store"]:
        p = os.path.join(path, sub)
        if os.path.isdir(p):
            total = 0
            for root, _d, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files)
            out[sub] = total
    out["total"] = sum(out.values())
    with open(os.path.join(path, "manifest.json")) as f:
        out["n_docs"] = json.load(f)["n_docs"]
    return out


def report(root: str) -> list[dict]:
    if os.path.exists(os.path.join(root, "SEGMENTS.json")):
        with open(os.path.join(root, "SEGMENTS.json")) as f:
            ptr = json.load(f)
        rows = []
        for e in ptr["segments"]:
            u = _artifact_usage(os.path.join(root, "segments", e["name"]))
            u["name"] = e["name"]
            rows.append(u)
        return rows
    u = _artifact_usage(root)
    u["name"] = os.path.basename(root.rstrip("/"))
    return [u]


def main() -> None:
    root = sys.argv[1]
    rows = report(root)
    cols = ["name", "n_docs", "blocks", "term_stats", "doc_stats",
            "deletes", "doc_store", "total"]
    print("\t".join(cols))
    for u in rows:
        print("\t".join(str(u.get(c, 0)) for c in cols))
    if len(rows) > 1:
        tot = {c: sum(u.get(c, 0) for u in rows) for c in cols[1:]}
        print("\t".join(["TOTAL"] + [str(tot[c]) for c in cols[1:]]))


if __name__ == "__main__":
    main()
