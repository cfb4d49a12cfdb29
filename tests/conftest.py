import pytest

from record_linkage_ldu_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="rl-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_gen(spark):
    """~200-doc seeded fixture (FIXTURES.md 'tiny'): crossJoin-verifiable."""
    from record_linkage_ldu_spark.sources.datagen import generate_documents

    df = generate_documents(spark, 90, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def small_gen(spark):
    """Mirrors reference scale (FIXTURES.md 'small'): the F1 gate."""
    from record_linkage_ldu_spark.sources.datagen import generate_documents

    df = generate_documents(spark, 900, seed=7).cache()
    df.count()
    return df
