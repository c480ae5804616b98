import pytest


@pytest.fixture(scope="session")
def spark():
    from dumpster.session import get_spark
    s = get_spark("tests", cores=8, chunk_rows=2048)
    yield s
    s.stop()
