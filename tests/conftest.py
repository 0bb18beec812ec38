import pytest

from graphical_context_extraction_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def docs_path(spark):
    from graphical_context_extraction_pipeline_spark.datagen import ensure_documents

    return ensure_documents(spark, "sf0.001")
