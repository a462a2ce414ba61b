"""Relational pipelines over the TPC-H-style tables — the generic
wide-join / broadcast-join / rollup shapes a data engine must carry beyond
the search surface (the reference's only relational work is tiny
SQLAlchemy lookups, smse_backend/routes/search.py:88-127; these are the
distributed equivalents).

Float policy (README): money columns are 2-decimal doubles; every sum is
taken in EXACT SCALED INTEGERS — revenue = round(price*100) * (100 -
round(discount*100)) in 1e-4 dollar units, an int64 — so results are
independent of batch/partition order and hash-compare against DuckDB
bit-for-bit. No double accumulations anywhere.

Two join shapes, chosen by side size (SURVEY.md §4 guidance):
  - revenue_by_month: lineitem ⋈ orders is BIG-⋈-BIG -> per-batch combiner
    on the fact side, then a real distributed hash join (Dataset.join) on
    the key, then a small groupby rollup.
  - nation_revenue: supplier/nation are DIMENSION tables -> ray.put the
    joined dim once, map-side lookup inside map_batches (broadcast join;
    never a shuffle for the small side).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from smse_backend_ray.functions.collect import collect_table
from smse_backend_ray.functions.joins import dsjoin
from smse_backend_ray.sources.corpus import _parallel_blocks, _parquet_rows


def _read(sf_dir: str, table: str, columns: list[str]) -> "ray.data.Dataset":
    path = os.path.join(sf_dir, f"{table}.parquet")
    ds = ray.data.read_parquet(path, columns=columns)
    return ds.repartition(_parallel_blocks(_parquet_rows(path)))


def _revenue_scaled(price: np.ndarray, discount: np.ndarray) -> np.ndarray:
    """Exact 1e-4-dollar units: round(p*100) * (100 - round(d*100)).
    Half-away rounding via floor(x+0.5) — values are non-negative."""
    p = np.floor(price * 100.0 + 0.5).astype(np.int64)
    d = np.floor(discount * 100.0 + 0.5).astype(np.int64)
    return p * (100 - d)


def revenue_by_month(sf_dir: str) -> pa.Table:
    """Monthly gross revenue: lineitem ⋈ orders on orderkey, rolled up by
    order month (ym = year*100 + month, exact int32). The fact side is
    pre-combined per batch to one row per orderkey BEFORE the hash join —
    the combiner halves (here: 4x's) the exchange and is the load-bearing
    move when the fact table is 10^11 rows."""

    def combine(t: pa.Table) -> pa.Table:
        rev = _revenue_scaled(
            t["l_extendedprice"].to_numpy(), t["l_discount"].to_numpy()
        )
        part = pa.table({"l_orderkey": t["l_orderkey"], "rev": pa.array(rev)})
        g = part.group_by("l_orderkey").aggregate([("rev", "sum"), ("rev", "count")])
        return pa.table(
            {
                "l_orderkey": g["l_orderkey"],
                "rev": g["rev_sum"],
                "n": pc.cast(g["rev_count"], pa.int64()),
            }
        )

    facts = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    joined = dsjoin(
        facts, orders, "inner", _parallel_blocks(),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def month_rows(t: pa.Table) -> pa.Table:
        dt = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        ym = (
            pc.year(dt).to_numpy(zero_copy_only=False) * 100
            + pc.month(dt).to_numpy(zero_copy_only=False)
        ).astype(np.int32)
        part = pa.table(
            {"ym": pa.array(ym), "rev": t["rev"], "n": t["n"]}
        )
        g = part.group_by("ym").aggregate([("rev", "sum"), ("n", "sum")])
        return pa.table(
            {"ym": g["ym"], "rev": g["rev_sum"], "n": g["n_sum"]}
        )

    from ray.data.aggregate import Sum

    rolled = (
        joined.map_batches(month_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ym")
        .aggregate(Sum("rev", alias_name="revenue_scaled"), Sum("n", alias_name="n_items"))
    )
    t = collect_table(rolled)
    t = pa.table(
        {
            "ym": pc.cast(t["ym"], pa.int32()),
            "revenue_scaled": pc.cast(t["revenue_scaled"], pa.int64()),
            "n_items": pc.cast(t["n_items"], pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t["ym"]))


def revenue_by_month_sql() -> str:
    return """
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
         AS revenue_scaled,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def nation_revenue(sf_dir: str) -> pa.Table:
    """Revenue by supplier nation: the dimension chain supplier ⋈ nation is
    tiny (10^2 / 25 rows even at 100 TB fact scale), so it is joined
    driver-side once, broadcast via ``ray.put``, and the fact table does a
    map-side array lookup — no shuffle for the small side, one combiner
    groupby for the rollup."""
    import pyarrow.parquet as pq

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nkey = nat["n_nationkey"].to_numpy()
    names = nat["n_name"].to_pylist()
    name_of = dict(zip(nkey.tolist(), names))
    # dense suppkey -> nation-name-index arrays (suppkeys are 1..N)
    skeys = sup["s_suppkey"].to_numpy()
    snat = sup["s_nationkey"].to_numpy()
    lut = np.full(int(skeys.max()) + 1, -1, dtype=np.int64)
    lut[skeys] = snat
    names_sorted = sorted(set(names))
    name_idx = {n: i for i, n in enumerate(names_sorted)}
    nat_to_idx = np.full(int(nkey.max()) + 1, -1, dtype=np.int64)
    for k, nm in name_of.items():
        nat_to_idx[k] = name_idx[nm]
    ref = ray.put((lut, nat_to_idx))

    def partial(t: pa.Table) -> pa.Table:
        lut_, n2i = ray.get(ref)
        rev = _revenue_scaled(
            t["l_extendedprice"].to_numpy(), t["l_discount"].to_numpy()
        )
        idx = n2i[lut_[t["l_suppkey"].to_numpy()]]
        sums = np.zeros(len(names_sorted), dtype=np.int64)
        cnts = np.zeros(len(names_sorted), dtype=np.int64)
        np.add.at(sums, idx, rev)
        np.add.at(cnts, idx, 1)
        nz = np.flatnonzero(cnts)
        return pa.table(
            {
                "nidx": pa.array(nz, type=pa.int64()),
                "rev": pa.array(sums[nz], type=pa.int64()),
                "n": pa.array(cnts[nz], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    rolled = (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("nidx")
        .aggregate(Sum("rev", alias_name="revenue_scaled"), Sum("n", alias_name="n_items"))
    )
    t = collect_table(rolled)
    t = pa.table(
        {
            "n_name": pa.array(
                [names_sorted[i] for i in t["nidx"].to_pylist()], type=pa.string()
            ),
            "revenue_scaled": pc.cast(t["revenue_scaled"], pa.int64()),
            "n_items": pc.cast(t["n_items"], pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t["n_name"]))


def order_priority_counts(sf_dir: str) -> pa.Table:
    """TPC-H Q4 shape (EXISTS semi-join): orders placed in 1996 that have
    at least one qualifying lineitem (l_discount > 0.05), counted by
    o_orderpriority. The fact side shrinks to DISTINCT qualifying orderkeys
    per batch (combiner) before the bucketed distributed semi-join; the
    orders side prunes to the date window and two columns at the read."""
    import datetime

    from smse_backend_ray.functions.joins import semi_join

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)

    def window(t: pa.Table) -> pa.Table:
        dt = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        m = pc.and_(
            pc.greater_equal(dt, pa.scalar(lo)), pc.less(dt, pa.scalar(hi))
        )
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(window, batch_format="pyarrow", zero_copy_batch=True)

    def qualifying(t: pa.Table) -> pa.Table:
        m = pc.greater(t["l_discount"], 0.05)
        k = t.filter(m).select(["l_orderkey"])
        # per-batch DISTINCT combiner: the semi-join right side carries one
        # row per (batch, orderkey), not one per lineitem
        g = k.group_by("l_orderkey").aggregate([])
        return g.rename_columns(["o_orderkey"])

    quals = _read(sf_dir, "lineitem", ["l_orderkey", "l_discount"]).map_batches(
        qualifying, batch_format="pyarrow", zero_copy_batch=True
    )
    left_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
    )
    kept = semi_join(orders, quals, keys=["o_orderkey"], left_schema=left_schema)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([("o_orderkey", "count")])
        return pa.table(
            {
                "o_orderpriority": g["o_orderpriority"],
                "n": pc.cast(g["o_orderkey_count"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    rolled = (
        kept.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_orders"))
    )
    t = collect_table(rolled)
    t = pa.table(
        {
            "o_orderpriority": t["o_orderpriority"],
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t["o_orderpriority"]))


def order_priority_counts_sql() -> str:
    return """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_discount > CAST(0.05 AS DOUBLE)
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def nation_revenue_sql() -> str:
    return """
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
         AS revenue_scaled,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""
