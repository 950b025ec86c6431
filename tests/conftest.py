from __future__ import annotations

import tempfile

import pytest

from hadoop_invertedindexer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="hii-tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="hii_wh_"),
            # local-mode default heap is 1g; one long session serving
            # ~480 tests needs headroom for codegen classes, broadcast
            # refs, and hash-agg pages (OOM'd at ~350 tests without it)
            "spark.driver.memory": "8g",
            # no test reads the UI/REST API; the live UI store update on
            # every task/stage event is pure overhead across a ~920-test
            # session (r15, suite-runtime work — VERDICT r14 item 5)
            "spark.ui.enabled": "false",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
