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
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from smse_backend_ray.functions.collect import collect_table
from smse_backend_ray.functions.rounding import round_half_away
from smse_backend_ray.sources.corpus import _parallel_blocks, _parquet_rows

SESSION_GAP_MIN = 30


def _read_events(sf_dir: str) -> "ray.data.Dataset":
    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(
        path,
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return ds.repartition(_parallel_blocks(_parquet_rows(path)))


def hourly_window_agg(sf_dir: str) -> pa.Table:
    """Tumbling 1h windows per event_type: count + sum(value).

    Pre-aggregates inside map_batches (one row per (window, type) per batch)
    before the small groupby — the combiner pattern (SURVEY.md A5/A6).

    Float determinism: values are rounded to 4 decimals as SCALED int64
    BEFORE summation (engine<->SQL lockstep pair with
    ``hourly_window_agg_sql``), so the sum is exact-integer and therefore
    independent of batch/partition order — unlike a double sum, whose
    result depends on Ray's re-reduce order (README float policy)."""

    def partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        # null values arrive as NaN; sign/floor would propagate NaN and the
        # int64 cast would turn it into INT64_MIN garbage. SQL SUM skips
        # NULLs, which in the exact-integer domain is identical to adding 0
        # (n stays count(*), matching the SQL twin's count of all rows).
        v = np.where(np.isnan(v), 0.0, v)
        # floor(|v|*1e4 + 0.5): same half-away formula as rounding.py, kept
        # in the scaled-integer domain (SQL twin: round(value*10000, 0))
        iv = (np.sign(v) * np.floor(np.abs(v) * 10000.0 + 0.5)).astype(np.int64)
        g = (
            pa.table(
                {
                    "window": win,
                    "event_type": t["event_type"],
                    "sum_iv": pa.array(iv, type=pa.int64()),
                }
            )
            .group_by(["window", "event_type"])
            .aggregate([("sum_iv", "sum"), ("sum_iv", "count")])
        )
        return pa.table(
            {
                "window": g["window"],
                "event_type": g["event_type"],
                "sum_iv": g["sum_iv_sum"],
                "n": pc.cast(g["sum_iv_count"], pa.int64()),
            }
        )

    agg = (
        _read_events(sf_dir)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window", "event_type"])
        .aggregate(Sum("sum_iv", alias_name="sum_iv"), Sum("n", alias_name="n"))
    )
    t = collect_table(agg)
    sum_value = t["sum_iv"].to_numpy().astype(np.float64) / 10000.0
    t = pa.table(
        {
            "window": pc.cast(t["window"], pa.timestamp("us")),
            "event_type": t["event_type"],
            "n": pc.cast(t["n"], pa.int64()),
            "sum_value": pa.array(round_half_away(sum_value, 4), type=pa.float64()),
        }
    )
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("window", "ascending"), ("event_type", "ascending")]
        )
    )


def hourly_window_agg_sql() -> str:
    # sum over 4-decimal-scaled BIGINTs (exact, order-free), then back to
    # double — MUST stay in lockstep with hourly_window_agg's partial()
    return """
SELECT date_trunc('hour', ts) AS window, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(SUM(CAST(round(value * 10000, 0) AS BIGINT)) / 10000.0, 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def user_sessions(sf_dir: str, gap_min: int = SESSION_GAP_MIN) -> pa.Table:
    """Gap-based sessionization per user: a new session starts when the gap
    to the previous event exceeds ``gap_min`` minutes. Returns per-user
    session count + total events."""

    _UNIT_PER_SEC = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}

    def per_user(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        ts = g["ts"].take(order)
        # exact integer gap comparison in the column's NATIVE resolution
        # (epoch ints via cast; no pandas round-trip, no ns assumption);
        # matches SQL date_diff('microsecond')
        unit = ts.type.unit
        vals = pc.cast(ts, pa.int64()).to_numpy()
        gap_ticks = gap_min * 60 * _UNIT_PER_SEC[unit]
        n_sessions = 1 + int((np.diff(vals) > gap_ticks).sum())
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()]),
                "n_sessions": pa.array([n_sessions], type=pa.int64()),
                "n_events": pa.array([g.num_rows], type=pa.int64()),
            }
        )

    out = _read_events(sf_dir).groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    t = collect_table(out)
    t = pa.table(
        {
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t["user_id"]))


RECENT_HOURS = 24


def _max_ts_us(path: str) -> int | None:
    """Global max(ts) in epoch-microseconds via a tiny distributed aggregate
    (one row per batch -> driver max); never a driver-side column scan.
    None when the table is empty or ts is entirely null (the SQL twin
    degrades to zero rows in both cases)."""
    ds = ray.data.read_parquet(path, columns=["ts"])

    def bmax(t: pa.Table) -> pa.Table:
        m = pc.max(pc.cast(t["ts"], pa.int64())).as_py() if t.num_rows else None
        vals = [] if m is None else [m]
        return pa.table({"m": pa.array(vals, type=pa.int64())})

    t = collect_table(ds.map_batches(bmax, batch_format="pyarrow", zero_copy_batch=True))
    vals = t["m"].to_pylist()
    return max(vals) if vals else None


def recent_events(sf_dir: str, hours: int = RECENT_HOURS) -> pa.Table:
    """Age-threshold filter + strftime row formatting (reference F7/F8:
    ``now() - timedelta(hours=24)`` cleanup threshold
    smse_backend/services/file_storage.py:687 and history-row
    ``strftime("%Y-%m-%d %H:%M:%S")`` smse_backend/routes/user.py:24).

    The threshold anchors on max(ts) in the data, not wall clock, so the
    result is deterministic. The filter pushes down to the parquet read
    (row-group pruning — at stream scale only the recent tail is scanned);
    formatting is a vectorized per-batch kernel. Timestamps are truncated to
    whole seconds before formatting: Arrow's %S emits fractional seconds,
    DuckDB's does not."""
    path = os.path.join(sf_dir, "events.parquet")
    mx = _max_ts_us(path)
    if mx is None:  # empty table / all-null ts: zero rows, like the oracle
        return pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "ts_str": pa.array([], type=pa.string()),
            }
        )
    thresh = mx - hours * 3600 * 1_000_000
    thresh_scalar = pa.scalar(thresh, type=pa.int64()).cast(pa.timestamp("us"))

    def fmt(t: pa.Table) -> pa.Table:
        # floor THEN cast to second resolution: %S on a sub-second type
        # prints fractional digits, which DuckDB's %S never does
        secs = pc.cast(pc.floor_temporal(t["ts"], unit="second"), pa.timestamp("s"))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_str": pc.strftime(secs, format="%Y-%m-%d %H:%M:%S"),
            }
        )

    ds = ray.data.read_parquet(
        path,
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pc.field("ts") >= thresh_scalar,
    ).map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)
    t = collect_table(ds)
    return t.take(pc.sort_indices(t["event_id"]))


def recent_events_sql(hours: int = RECENT_HOURS) -> str:
    return f"""
WITH mx AS (SELECT max(ts) AS m FROM events)
SELECT event_id, user_id, event_type,
       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_str
FROM events, mx
WHERE ts >= m - INTERVAL {hours} HOUR
ORDER BY event_id
"""


def props_agg(sf_dir: str) -> pa.Table:
    """Semi-structured props extraction + rollup: pull the integer ``k``
    field out of the JSON-string ``props`` column (vectorized
    ``pc.extract_regex`` — no per-row json.loads) and aggregate per
    event_type with the map-side combiner pattern. Reference analog: the
    free-form ``User.preferences JSON`` column (smse_backend/models/
    user.py:18) — applied data-side at stream scale."""
    path = os.path.join(sf_dir, "events.parquet")

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())  # null when no match
        g = (
            pa.table({"event_type": t["event_type"], "k": k})
            .group_by("event_type")
            .aggregate([("k", "sum"), ("k", "count")])  # count skips nulls
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "sum_k": g["k_sum"],
                "n": pc.cast(g["k_count"], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(path, columns=["event_type", "props"])
    ds = ds.repartition(_parallel_blocks(_parquet_rows(path)))
    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"))
    )
    t = collect_table(agg)
    t = pa.table(
        {
            "event_type": t["event_type"],
            "n": pc.cast(t["n"], pa.int64()),
            "sum_k": pc.cast(t["sum_k"], pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t["event_type"]))


def props_agg_sql() -> str:
    return r"""
SELECT event_type, CAST(count(k) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k
FROM (SELECT event_type,
             CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT) AS k
      FROM events)
GROUP BY event_type ORDER BY event_type
"""


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
