"""Exclusive-writer lock shared by the index and vector stacks.

The Tantivy ``.tantivy-writer.lock`` shape (one IndexWriter per
index), held the way the reference's library holds it — an advisory
``flock`` (fs2 model), NOT an O_EXCL marker file. The kernel releases
the lock the instant the holding process dies, so a crashed committer
never wedges crash-recovery (restart, adopt(), continue) and there is
no stale-age heuristic to tune. Reentrancy is per-owner via a mutable
``held`` cell so compound operations (force_merge -> merge_once ->
publish) nest freely within one writer object.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager


@contextmanager
def exclusive_writer_lock(root: str, held: list[bool]):
    """Acquire ``<root>/WRITER.lock`` for the duration of the block.

    ``held`` is the owner's one-element reentrancy cell ([False] at
    construction): when already True the block runs under the existing
    acquisition. Raises ValueError immediately when another live
    process (or another writer object in this process) holds the lock.
    """
    if held[0]:
        yield
        return
    import fcntl

    lock = os.path.join(root, "WRITER.lock")
    fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            raise ValueError(
                "writer lock held by a live process; one writer per "
                f"stack ({lock})")
        os.truncate(fd, 0)
        os.write(fd, json.dumps(
            {"pid": os.getpid(), "ts": time.time()}).encode())
        held[0] = True
        try:
            yield
        finally:
            held[0] = False
            fcntl.flock(fd, fcntl.LOCK_UN)
    finally:
        os.close(fd)
