import pytest


@pytest.fixture(scope="session")
def spark():
    from paddleocr_spark.session import get_spark

    s = get_spark("pytest", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def doc_items(sf_dir):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
