"""Property test: the attribution join body equals a brute-force
Python mirror on arbitrary small event sets — boundary semantics
(strictly-after, inclusive window end, same-user only) pinned
independently of the DuckDB oracle."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 5, 1, 0, 0, 0)

EVENT = st.tuples(
    st.integers(min_value=0, max_value=3),            # user_id
    st.integers(min_value=0, max_value=150),          # minutes offset
    st.sampled_from(["signup", "purchase", "view"]),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(EVENT, min_size=0, max_size=14))
def test_conversion_join_matches_bruteforce(spark, events):
    from pdf_extractor_spark.queries.temporal import conversion_join

    rows = [(i, BASE + dt.timedelta(minutes=m), u, t, 0.0, "{}")
            for i, (u, m, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r.user_id, r.signup_id, r.purchase_id, r.lag_us)
           for r in conversion_join(
               df.filter(F.col("event_type") == "signup"),
               df.filter(F.col("event_type") == "purchase")).collect()}

    want = set()
    for si, (su, sm, stype) in enumerate(events):
        if stype != "signup":
            continue
        for pi, (pu, pm, ptype) in enumerate(events):
            if ptype != "purchase" or pu != su:
                continue
            lag_min = pm - sm
            if 0 < lag_min <= 60:          # strictly after, <= 1 hour
                want.add((su, si, pi, lag_min * 60 * 1_000_000))
    assert got == want
