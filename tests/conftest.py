import shutil

import pandas as pd
import pytest

from solr_spark.corpus import synth_corpus, synth_corpus_pandas
from solr_spark.index.build import IndexConfig, build_index
from solr_spark.oracle import BruteForceIndex
from solr_spark.session import get_spark

N_DOCS = 1200
INDEX_DIR = "/tmp/solr_spark_test_index"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("solr_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def test_config():
    # low hot threshold so salting is actually exercised at test scale
    return IndexConfig(hot_df_threshold=400, n_salts=4, block_size=64, n_term_buckets=8)


@pytest.fixture(scope="session")
def index(spark, test_config):
    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    corpus = synth_corpus(spark, N_DOCS)
    return build_index(spark, corpus, INDEX_DIR, test_config)


@pytest.fixture(scope="session")
def oracle_corpus() -> pd.DataFrame:
    pdf = synth_corpus_pandas(N_DOCS)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    return pdf


@pytest.fixture(scope="session")
def oracle(oracle_corpus) -> BruteForceIndex:
    return BruteForceIndex(oracle_corpus)
