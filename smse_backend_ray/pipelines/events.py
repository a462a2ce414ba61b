"""Windowed aggregation over the ``events`` stream table.

The reference has no streaming operators (SURVEY.md §2.9) — its closest
artifact is the periodic cleanup job. These operators supply the
batch-over-ordered-log window semantics a training-data pipeline needs:
tumbling time windows (groupby on a truncated timestamp) and gap-based
sessionization (per-key ordered scan inside ``map_groups``). Ordering
assumption: sessionization sorts each user's events by ts within the group;
event time is taken as-is (no watermarks/late data — SURVEY.md §2.9).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from smse_backend_ray.functions.collect import collect_table
from smse_backend_ray.functions.rounding import round_half_away
from smse_backend_ray.sources.corpus import _parallel_blocks

SESSION_GAP_MIN = 30


def _read_events(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return ds.repartition(_parallel_blocks())


def hourly_window_agg(sf_dir: str) -> pa.Table:
    """Tumbling 1h windows per event_type: count + sum(value).

    Pre-aggregates inside map_batches (one row per (window, type) per batch)
    before the small groupby — the combiner pattern (SURVEY.md A5/A6)."""

    def partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        g = (
            pa.table({"window": win, "event_type": t["event_type"], "value": t["value"]})
            .group_by(["window", "event_type"])
            .aggregate([("value", "sum"), ("value", "count")])
        )
        return pa.table(
            {
                "window": g["window"],
                "event_type": g["event_type"],
                "sum_value": g["value_sum"],
                "n": pc.cast(g["value_count"], pa.int64()),
            }
        )

    agg = (
        _read_events(sf_dir)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window", "event_type"])
        .aggregate(Sum("sum_value", alias_name="sum_value"), Sum("n", alias_name="n"))
    )
    t = collect_table(agg)
    t = pa.table(
        {
            "window": pc.cast(t["window"], pa.timestamp("us")),
            "event_type": t["event_type"],
            "n": pc.cast(t["n"], pa.int64()),
            "sum_value": pa.array(round_half_away(t["sum_value"].to_numpy(), 4), type=pa.float64()),
        }
    )
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("window", "ascending"), ("event_type", "ascending")]
        )
    )


def hourly_window_agg_sql() -> str:
    return """
SELECT date_trunc('hour', ts) AS window, event_type,
       CAST(count(*) AS BIGINT) AS n, round(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def user_sessions(sf_dir: str, gap_min: int = SESSION_GAP_MIN) -> pa.Table:
    """Gap-based sessionization per user: a new session starts when the gap
    to the previous event exceeds ``gap_min`` minutes. Returns per-user
    session count + total events."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        # exact integer timedelta comparison in the column's native
        # resolution (datetime64[us] here — NOT ns; astype(int64) would
        # silently be microseconds); matches SQL date_diff('microsecond')
        gaps = g["ts"].diff()
        n_sessions = 1 + int((gaps > pd.Timedelta(minutes=gap_min)).sum())
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [n_sessions],
                "n_events": [len(g)],
            }
        )

    out = _read_events(sf_dir).groupby("user_id").map_groups(per_user, batch_format="pandas")
    t = collect_table(out)
    t = pa.table(
        {
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t["user_id"]))


def user_sessions_sql(gap_min: int = SESSION_GAP_MIN) -> str:
    return f"""
WITH ordered AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
marks AS (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('microsecond', prev_ts, ts) > {gap_min * 60 * 1000000}
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM marks GROUP BY user_id ORDER BY user_id
"""
