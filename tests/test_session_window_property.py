"""Property test (hypothesis): F.session_window in batch mode is
equivalent to the classic gaps-and-islands rewrite on arbitrary event
streams — the boundary semantics batch_sessionize probed (an event at
exactly prev_ts + gap MERGES; session_end = last_ts + gap) must hold
for every input, not just the fixture.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

GAP_S = 60  # 1-minute gap

_row = st.tuples(
    st.integers(min_value=0, max_value=2),       # user
    st.integers(min_value=0, max_value=600),     # offset seconds
)


def _expected(pdf: pd.DataFrame) -> pd.DataFrame:
    """Gaps-and-islands in pandas: strictly-greater-than-gap breaks."""
    out = []
    for user, g in pdf.groupby("user"):
        ts = sorted(g.ts)
        start, last, n = ts[0], ts[0], 0
        for t in ts:
            if (t - last).total_seconds() > GAP_S:
                out.append((user, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        out.append((user, start, last, n))
    return pd.DataFrame(
        out, columns=["user", "session_start", "last_ts", "n_events"]
    ).assign(
        session_end=lambda d: d.last_ts + pd.Timedelta(seconds=GAP_S)
    )[["user", "session_start", "session_end", "n_events"]]


def test_session_window_matches_gaps_and_islands(spark):
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows=st.lists(_row, min_size=1, max_size=40))
    def run(rows):
        base = pd.Timestamp("2026-01-01")
        pdf = pd.DataFrame(rows, columns=["user", "off"]).assign(
            ts=lambda d: base + pd.to_timedelta(d.off, unit="s")
        )[["user", "ts"]]
        got = (
            spark.createDataFrame(pdf)
            .groupBy("user", F.session_window("ts", f"{GAP_S} seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
            .toPandas()
        )
        exp = _expected(pdf)
        key = ["user", "session_start"]
        pd.testing.assert_frame_equal(
            got.sort_values(key, kind="mergesort").reset_index(drop=True),
            exp.sort_values(key, kind="mergesort").reset_index(drop=True),
            check_dtype=False,
        )

    run()
