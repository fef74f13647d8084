"""Shared fixtures: one SparkSession, one tiny corpus + built index."""

from __future__ import annotations

import shutil

import pytest

from data_prepper_spark.corpus import write_code_files
from data_prepper_spark.index.build import build_index
from data_prepper_spark.session import get_spark

SMOKE_SF = 0.0002  # 200 docs


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dps-tests", cores=8, shuffle_partitions=16)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    shutil.rmtree(d, ignore_errors=True)
    write_code_files(spark, SMOKE_SF, d)
    return d


@pytest.fixture(scope="session")
def index_dir(spark, corpus_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    build_index(spark, corpus_dir, d, n_shards=8, units=2, shard_groups=2)
    return d


@pytest.fixture(scope="session")
def corpus_docs(spark, corpus_dir):
    """[(doc_id, content)] with oracle-computed doc ids."""
    from tests.oracle import doc_id_for

    rows = spark.read.parquet(corpus_dir).collect()
    return [(doc_id_for(r.repo, r.path, r.commit), r.content) for r in rows]
