from __future__ import annotations

import datetime as dt

import pytest

from engine.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "100"},
    )
    yield s
    s.stop()


ET = "America/New_York"


@pytest.fixture()
def sierra_rows():
    """Golden active-patron rows mirroring the reference fixtures
    (tests/test_pipeline_controller.py:20-43 in /root/reference):
    patron 456 appears twice with different addresses (J4 must keep the
    lower display_order), patron 789 is all-null demographics."""
    ts = lambda h: dt.datetime(2021, 1, 1, h, 0, 0)  # noqa: E731
    return [
        # id, ptype, pcode3, phlc, city, region, postal, address,
        # circ_active, deletion, updated, created, display_order, addr_type
        (123, 10, 1, "aa", "New York", "NY", "10001", "123 Main St",
         dt.date(2021, 1, 1), None, ts(1), ts(1), 0, 1),
        (456, 20, 2, "home_library2", "Brooklyn", "NY", "11201-1234",
         "456 First Ave", dt.date(2021, 1, 2), None, ts(2), ts(2), 0, 1),
        (456, 20, 2, "other_library", "Queens", "NY", "11375",
         "789 Second St", dt.date(2021, 1, 2), None, ts(2), ts(2), 1, 1),
        (789, None, None, None, None, None, None, None,
         None, None, ts(3), ts(3), 0, 1),
    ]


SIERRA_TEST_COLUMNS = [
    "patron_id_plaintext", "ptype_code", "pcode3", "patron_home_library_code",
    "city", "region", "postal_code", "address", "circ_active_date_et",
    "deletion_date_et", "last_updated_timestamp", "creation_timestamp",
    "display_order", "patron_record_address_type_id",
]


@pytest.fixture()
def sierra_df(spark, sierra_rows):
    schema = (
        "patron_id_plaintext long, ptype_code long, pcode3 long, "
        "patron_home_library_code string, city string, region string, "
        "postal_code string, address string, circ_active_date_et date, "
        "deletion_date_et date, last_updated_timestamp timestamp, "
        "creation_timestamp timestamp, display_order int, "
        "patron_record_address_type_id int"
    )
    return spark.createDataFrame(sierra_rows, schema=schema)
