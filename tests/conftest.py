from __future__ import annotations

import pytest

from ontology_learning_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="ols-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_docs():
    from ontology_learning_spark.fixtures import generator

    return generator.generate_documents(n_docs=120, seed=42)


@pytest.fixture(scope="session")
def docs_df(spark, fixture_docs):
    from ontology_learning_spark.fixtures.generator import DOCUMENT_SCHEMA

    return spark.createDataFrame(fixture_docs, schema=DOCUMENT_SCHEMA).cache()


@pytest.fixture(scope="session")
def oracle_result(fixture_docs):
    from ontology_learning_spark.oracle import reference as O

    return O.run(fixture_docs)
