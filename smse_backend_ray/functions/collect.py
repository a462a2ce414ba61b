"""Driver-side collection of small Dataset results.

Ray groupby/aggregate outputs can include empty ZERO-COLUMN blocks whose
schema differs from the data blocks, which makes a bare
``pa.concat_tables(ray.get(ds.to_arrow_refs()))`` raise ArrowInvalid
nondeterministically (depends on shuffle partitioning). Always collect
through here.
"""

from __future__ import annotations

import pyarrow as pa

import ray


def collect_table(ds, empty_schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a SMALL dataset to one Arrow table, dropping empty
    zero-column blocks. ``empty_schema`` types the result when every block
    is empty (falls back to ds.schema())."""
    tabs = [
        t
        for t in ray.get(ds.to_arrow_refs())
        if t.num_rows > 0 and t.num_columns > 0
    ]
    if not tabs:
        schema = empty_schema
        if schema is None:
            ds_schema = ds.schema()
            if ds_schema is None:  # fully-empty pipeline: no schema anywhere
                return pa.table({})
            schema = pa.schema(ds_schema.base_schema)
        return schema.empty_table()
    if len(tabs) == 1:
        return tabs[0]
    return pa.concat_tables(tabs, promote_options="permissive")


def fold_partials(ds, fold_fn, fan_in: int | None = None):
    """Insert a tree-fold level between per-block partials and the driver
    merge: repartition the (tiny) partial rows to <= ``fan_in`` blocks and
    re-apply the associative ``fold_fn`` per block, so the driver-side
    merge sees O(fan_in * partial_size) rows instead of
    O(source_blocks * partial_size) — the difference between a bounded
    merge and a multi-GB driver table when the source is 10^6+ blocks at
    100 TB. ``fold_fn`` must be a combiner (fold(concat(a, b)) ==
    fold(concat(fold(a), fold(b)))) — true for top-k / bottom-k / grouped
    sums, the three shapes using this. ``fan_in`` defaults to
    config.FOLD_FAN_IN — the same constant callers compare their source
    block count against, so trigger and width can't desynchronize."""
    if fan_in is None:
        from smse_backend_ray.config import FOLD_FAN_IN

        fan_in = FOLD_FAN_IN
    return ds.repartition(fan_in).map_batches(
        fold_fn, batch_format="pyarrow", zero_copy_batch=True
    )
