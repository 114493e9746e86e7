import pytest

from xs_vlm_ocr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small core count keeps unit tests fast; bench uses 8/32
    return get_spark(app_name="xs_vlm_ocr_spark_tests", cores=8, shuffle_partitions=8)
