from __future__ import annotations

import datetime as dt

import pytest


@pytest.fixture(scope="session")
def spark():
    from transcriptts.session import get_spark

    s = get_spark(app_name="transcriptts-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


BASE = dt.datetime(2025, 1, 1, 0, 0, 0)


def signal_df(spark, values, conv_id="s"):
    """(conv_id, turn_idx, ts, value) rows from a plain list — positional
    fixtures: ts = base + idx seconds, so index semantics match timestamps."""
    rows = [
        (conv_id, i, BASE + dt.timedelta(seconds=i), float(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, value double")


@pytest.fixture
def make_signal(spark):
    def _make(values, conv_id="s"):
        return signal_df(spark, values, conv_id)

    return _make
