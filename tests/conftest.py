from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prosearch_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("prosearch-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    """Deterministic synthetic input_hint-shaped corpus (200 docs)."""
    from prosearch_spark.corpus import synth_corpus

    return synth_corpus(spark, n_docs=200, n_repos=6, seed=42).cache()


@pytest.fixture(scope="session")
def corpus_rows(corpus):
    return [r.asDict() for r in corpus.collect()]
