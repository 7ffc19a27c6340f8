"""Block-encoded postings: delta+varint compression with block-max
metadata.

The Spark re-expression of Tantivy's posting-list layout (SURVEY.md
§1.2): per term, docids are stored as delta+bitpacked 128-doc blocks
with per-block max-tf enabling Block-Max WAND pruning (reference:
space report tantivy-cli/src/commands/inspect.rs:64-69; the block
format itself lives in the pinned tantivy library, Cargo.toml:31).

Our payload per block row:

    term        string   -- one row per (term, block)
    first_doc   long     -- block min docid  (pruning metadata)
    last_doc    long     -- block max docid  (pruning metadata)
    n           int      -- docs in block (<= BLOCK_SIZE)
    max_tf      int      -- block-max term frequency (WAND bound)
    min_dl      long     -- block-min doc length (tightens the bound)
    docs        binary   -- varint deltas from first_doc
    tfs         binary   -- varint tfs
    dls         binary   -- varint doc lengths

Build shape (scale-safe — NO collect_list over a hot term, NO window
over a skewed term partition): ``repartitionByRange(term, doc_id)`` →
``sortWithinPartitions`` → ``mapInPandas`` cutting per-term runs into
blocks. A hot term spanning several range partitions simply yields
several independent block runs — semantically equivalent, and each
task's memory is bounded by its partition, not by the term.

Decode is the inverse ``mapInPandas``; both directions are
Arrow-batched (no per-row Python UDFs).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOCK_SIZE = 128

BLOCK_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("first_doc", LongType(), False),
    StructField("last_doc", LongType(), False),
    StructField("n", IntegerType(), False),
    StructField("max_tf", IntegerType(), False),
    StructField("min_dl", LongType(), False),
    StructField("docs", BinaryType(), False),
    StructField("tfs", BinaryType(), False),
    StructField("dls", BinaryType(), False),
])

# record:"position" layout (meta.json:21-33): per block, the per-
# posting position lists are stored as one varint stream of deltas
# (first position absolute per posting, then gaps); poslens is absent
# because tfs already encodes each posting's position count.
BLOCK_SCHEMA_POS = StructType(
    BLOCK_SCHEMA.fields + [StructField("positions", BinaryType(), False)]
)

POSTING_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("doc_id", LongType(), False),
    StructField("tf", LongType(), False),
    StructField("dl", LongType(), False),
])

POSTING_SCHEMA_POS = StructType(
    POSTING_SCHEMA.fields
    + [StructField("positions", ArrayType(IntegerType()), False)]
)


# -- varint primitives (LEB128, unsigned) -------------------------------------

import numpy as np


def encode_varints(values) -> bytes:
    """LEB128-encode; vectorized fast path when every value < 128
    (one byte each — the common case for deltas and tfs in 128-doc
    blocks), Python loop otherwise."""
    a = np.asarray(values, dtype=np.int64)
    if a.size == 0:
        return b""
    if a.min() < 0:
        # unsigned LEB128 only: a negative value (e.g. deltas from
        # UNSORTED doc_ids) would loop forever in the generic path
        raise ValueError("encode_varints requires non-negative values")
    if a.max() < 128:
        return a.astype(np.uint8).tobytes()
    out = bytearray()
    for v in a.tolist():
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def decode_varints(buf: bytes) -> list[int]:
    b = np.frombuffer(buf, dtype=np.uint8)
    if not (b & 0x80).any():
        return b.astype(np.int64).tolist()  # all single-byte
    out: list[int] = []
    cur = 0
    shift = 0
    for x in b.tolist():
        cur |= (x & 0x7F) << shift
        if x & 0x80:
            shift += 7
        else:
            out.append(cur)
            cur = 0
            shift = 0
    return out


# -- encode / decode mapInPandas kernels ---------------------------------------

def _encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Input: sorted (term, doc_id, tf, dl) rows. Output: block rows.

    Carries an open run across Arrow batches so blocks fill to
    BLOCK_SIZE even when a term straddles batch boundaries.
    """
    pend: pd.DataFrame | None = None

    def cut(df: pd.DataFrame, flush_all: bool) -> tuple[list[dict], pd.DataFrame | None]:
        with_pos = "positions" in df.columns
        rows: list[dict] = []
        rest: pd.DataFrame | None = None
        for term, g in df.groupby("term", sort=False):
            docs = g["doc_id"].to_numpy()
            tfs = g["tf"].to_numpy()
            dls = g["dl"].to_numpy()
            poss = g["positions"].to_numpy() if with_pos else None
            n = len(docs)
            full = n if flush_all or term != df["term"].iloc[-1] else (
                (n // BLOCK_SIZE) * BLOCK_SIZE
            )
            import numpy as np

            for s in range(0, full, BLOCK_SIZE):
                e = min(s + BLOCK_SIZE, full)
                d = docs[s:e]
                deltas = np.diff(d, prepend=d[0])
                row = {
                    "term": term,
                    "first_doc": int(d[0]),
                    "last_doc": int(d[-1]),
                    "n": int(e - s),
                    "max_tf": int(tfs[s:e].max()),
                    "min_dl": int(dls[s:e].min()),
                    "docs": encode_varints(deltas),
                    "tfs": encode_varints(tfs[s:e]),
                    "dls": encode_varints(dls[s:e]),
                }
                if with_pos:
                    # one varint stream: per posting, first position
                    # absolute then gaps; tfs delimits the stream
                    stream: list[int] = []
                    for plist in poss[s:e]:
                        prev = None
                        for p in plist:
                            stream.append(int(p) if prev is None
                                          else int(p) - prev)
                            prev = int(p)
                    row["positions"] = encode_varints(stream)
                rows.append(row)
            if full < n:
                rest = g.iloc[full:]
        return rows, rest

    for batch in batches:
        if pend is not None:
            batch = pd.concat([pend, batch], ignore_index=True)
            pend = None
        rows, pend = cut(batch, flush_all=False)
        if rows:
            yield pd.DataFrame(rows)
    if pend is not None and len(pend):
        rows, _ = cut(pend, flush_all=True)
        if rows:
            yield pd.DataFrame(rows)


def _decode_np(buf: bytes) -> "np.ndarray":
    """Vectorized varint decode: all-single-byte buffers (the common
    case) are one ``frombuffer``; mixed buffers fall back."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if not (b & 0x80).any():
        return b.astype(np.int64)
    return np.asarray(decode_varints(buf), dtype=np.int64)


def _decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        with_pos = "positions" in batch.columns
        # `seg` is an opaque per-block passthrough tag (the live
        # segment-stack view labels each block with its source segment
        # so per-segment tombstones can anti-join after decode)
        with_seg = "seg" in batch.columns
        terms: list = []
        docs: list = []
        tfs: list = []
        dls: list = []
        poss: list = []
        segs: list = []
        for r in batch.itertuples(index=False):
            deltas = _decode_np(r.docs)
            # first stored delta is 0, so cumsum + first_doc restores
            # absolute ids in one vector op
            docs.append(deltas.cumsum() + r.first_doc)
            tf_arr = _decode_np(r.tfs)
            tfs.append(tf_arr)
            dls.append(_decode_np(r.dls))
            terms.append(np.repeat(np.array([r.term], dtype=object), r.n))
            if with_seg:
                segs.append(np.repeat(np.array([r.seg], dtype=object), r.n))
            if with_pos:
                stream = _decode_np(r.positions)
                off = 0
                for cnt in tf_arr:
                    seg = stream[off:off + cnt]
                    poss.append(seg.cumsum().astype("int32").tolist())
                    off += cnt
        if not terms:
            cols = {"term": [], "doc_id": [], "tf": [], "dl": []}
            if with_pos:
                cols["positions"] = []
            if with_seg:
                cols["seg"] = []
            yield pd.DataFrame(cols)
            continue
        out = {
            "term": np.concatenate(terms),
            "doc_id": np.concatenate(docs),
            "tf": np.concatenate(tfs),
            "dl": np.concatenate(dls),
        }
        if with_pos:
            out["positions"] = poss
        if with_seg:
            out["seg"] = np.concatenate(segs)
        yield pd.DataFrame(out)


# -- public API ----------------------------------------------------------------

def encode_blocks(postings: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(term, doc_id, tf, dl[, positions]) -> block rows.
    Range-partitioned by (term, doc_id) so each task sees contiguous
    sorted runs. A ``positions`` column triggers the record:"position"
    layout (extra varint position stream per block)."""
    with_pos = "positions" in postings.columns
    cols = ["term", "doc_id", "tf", "dl"] + (["positions"] if with_pos else [])
    np_ = num_partitions or postings.sparkSession.sparkContext.defaultParallelism
    arranged = (
        postings.select(*cols)
        .repartitionByRange(np_, "term", "doc_id")
        .sortWithinPartitions("term", "doc_id")
    )
    schema = BLOCK_SCHEMA_POS if with_pos else BLOCK_SCHEMA
    return arranged.mapInPandas(_encode_partition, schema)


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Block rows -> (term, doc_id, tf, dl[, positions][, seg]).

    A ``seg`` column on the input passes through per decoded posting
    (each posting tagged with its block's segment) — the hook the live
    segment-stack view uses to apply per-segment tombstones after
    decode (apply_deletes, index/artifact.py)."""
    with_pos = "positions" in blocks.columns
    schema = POSTING_SCHEMA_POS if with_pos else POSTING_SCHEMA
    if "seg" in blocks.columns:
        schema = StructType(
            schema.fields + [StructField("seg", StringType(), False)])
    return blocks.mapInPandas(_decode_partition, schema)


def block_upper_bound_expr(n_docs: str = "n_docs", avgdl: str = "avgdl",
                           df: str = "df") -> str:
    """Per-block BM25 upper bound (Block-Max WAND, conservative):
    idf * (k1+1)*max_tf / (max_tf + k1*(1-b+b*min_dl/avgdl)).
    min_dl minimizes the denominator => maximizes the score bound."""
    return (
        f"ln(1.0 + ({n_docs} - {df} + 0.5) / ({df} + 0.5))"
        f" * (max_tf * (1.2 + 1.0))"
        f" / (max_tf + 1.2 * (1.0 - 0.75 + 0.75 * min_dl / {avgdl}))"
    )
