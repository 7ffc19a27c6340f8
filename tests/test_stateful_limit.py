"""Stateful per-host limit across micro-batches (A7/P3 streaming)."""

from __future__ import annotations

import json
import os

from prosearch_spark.streaming.host_limit import admitted_stream

SCHEMA = "doc_id long, host string, text string"


def _wave(d: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for doc_id, host, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "host": host,
                                "text": text}) + "\n")


def test_limit_enforced_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: host a has 3 docs, host b has 1; limit = 4
    _wave(src, "w1.json", [(i, "a", f"t{i}") for i in range(3)]
          + [(100, "b", "x")])
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        admitted_stream(stream, "host", 4, SCHEMA)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 4  # everything admitted so far

    # wave 2: host a gets 3 MORE docs -> only 1 admitted (state carries
    # the count 3 across the restart), host b gets 2 -> both admitted
    _wave(src, "w2.json", [(i, "a", f"t{i}") for i in range(10, 13)]
          + [(101, "b", "y"), (102, "b", "z")])
    q2 = (
        admitted_stream(spark.readStream.schema(SCHEMA).json(src),
                        "host", 4, SCHEMA)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["doc_id"])
    assert len(by_host["a"]) == 4
    # deterministic admission: lowest doc_id of wave 2 wins the last slot
    assert sorted(by_host["a"]) == [0, 1, 2, 10]
    assert sorted(by_host["b"]) == [100, 101, 102]
