"""Shared Dataset.join wrapper.

Ray 2.49's hash-join reserves min(1, (CPU/2)/nparts) logical CPUs PER
PARTITION on its aggregator actors; two 16-partition joins in one DAG
reserve ~4 CPUs of placement tokens and deadlock a 4-CPU cluster (the
upstream map/sort tasks can never schedule). Actor num_cpus is a placement
token only — aggregators timeshare the host regardless — so pinning it tiny
is safe and keeps low-CPU configs live."""

from __future__ import annotations


def dsjoin(left, right, join_type, num_partitions, on, right_on=None):
    """Ray-native hash join. SPARSE-INPUT CAVEAT: Ray 2.49's aggregator
    materializes a partition that received no blocks as a ZERO-COLUMN table
    and pyarrow's join then dies with 'No match ... for key field
    reference' — so this is only safe when every hash partition is
    near-certain to receive rows on both sides (dense keys, rows >>
    num_partitions; e.g. the relational fact/dim rollups). For
    sparse/candidate-bounded inputs use attach_unique / semi_join below —
    one sort-shuffle groupby, empty-safe (found by the adversarial-corpus
    fuzz, tests/test_sqlgen_fuzz.py)."""
    return left.join(
        right,
        join_type,
        num_partitions,
        on=on,
        right_on=right_on,
        aggregator_ray_remote_args={"num_cpus": 0.01},
    )


def attach_unique(left, right, lkey, rkey, left_schema, payload_schema):
    """INNER-join a UNIQUE-keyed right payload onto left rows via one
    sort-shuffle groupby (no hash-join aggregators; empty partitions are a
    non-event on this path).

    left rows carry ``left_schema`` columns and join on ``left[lkey]``;
    right rows carry ``right[rkey]`` + ``payload_schema`` columns with at
    most ONE right row per key. Output: left columns + payload columns for
    every left row whose key has a right row (inner). Group size is
    bounded by the left fan-in per key + 1."""
    import numpy as np
    import pyarrow as pa

    lnames = [f.name for f in left_schema]
    pnames = [f.name for f in payload_schema]

    def lrows(t: "pa.Table") -> "pa.Table":
        if t.num_columns == 0 or t.num_rows == 0:
            return _mixed_empty(left_schema, payload_schema)
        cols = {"__k": t[lkey], "__side": pa.array(np.zeros(t.num_rows, np.int8))}
        for n in lnames:
            cols[n] = t[n]
        for f in payload_schema:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
        return pa.table(cols)

    def rrows(t: "pa.Table") -> "pa.Table":
        if t.num_columns == 0 or t.num_rows == 0:
            return _mixed_empty(left_schema, payload_schema)
        cols = {"__k": t[rkey], "__side": pa.array(np.ones(t.num_rows, np.int8))}
        for f in left_schema:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
        for n in pnames:
            cols[n] = t[n]
        return pa.table(cols)

    def grp(g: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        side = g["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        out_schema = pa.schema(list(left_schema) + list(payload_schema))
        if not lmask.any() or lmask.all():
            return out_schema.empty_table()
        pay = g.filter(pa.array(~lmask))
        lt = g.filter(pa.array(lmask))
        cols = {n: lt[n] for n in lnames}
        for n in pnames:
            v = pay[n][0]
            cols[n] = pa.array([v.as_py()] * lt.num_rows, type=pay[n].type)
        return pa.table(cols)

    mixed = left.map_batches(
        lrows, batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(rrows, batch_format="pyarrow", zero_copy_batch=True))
    return mixed.groupby("__k").map_groups(grp, batch_format="pyarrow")


def _mixed_empty(left_schema, payload_schema):
    import pyarrow as pa

    return pa.schema(
        [("__k", pa.int64()), ("__side", pa.int8())]
        + list(left_schema)
        + list(payload_schema)
    ).empty_table()


def semi_join(left, right, keys, left_schema):
    """LEFT-SEMI join via one sort-shuffle groupby on ``keys`` (list of
    column names shared by both sides): keep left rows whose key appears in
    right. Empty-safe like attach_unique."""
    import numpy as np
    import pyarrow as pa

    lnames = [f.name for f in left_schema]
    empty_mixed = pa.schema(
        [(n, left_schema.field(n).type) for n in lnames] + [("__side", pa.int8())]
    ).empty_table()

    def lrows(t: "pa.Table") -> "pa.Table":
        if t.num_columns == 0 or t.num_rows == 0:
            return empty_mixed
        cols = {n: t[n] for n in lnames}
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def rrows(t: "pa.Table") -> "pa.Table":
        if t.num_columns == 0 or t.num_rows == 0:
            return empty_mixed
        cols = {}
        for n in lnames:
            cols[n] = (
                t[n] if n in t.column_names
                else pa.nulls(t.num_rows, left_schema.field(n).type)
            )
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        return pa.table(cols)

    def grp(g: "pa.Table") -> "pa.Table":
        side = g["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        if not (side == 1).any() or not lmask.any():
            return left_schema.empty_table()
        return g.filter(pa.array(lmask)).select(lnames)

    mixed = left.map_batches(
        lrows, batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(rrows, batch_format="pyarrow", zero_copy_batch=True))
    return mixed.groupby(keys).map_groups(grp, batch_format="pyarrow")


def with_schema(ds, schema):
    """Normalize a Dataset's blocks to ``schema`` before a join.

    Ray 2.49's Aggregate operator emits EMPTY partitions as zero-column
    blocks (the 'Failed to hash the schemas' warning); pyarrow's join then
    fails with 'No match ... for key field reference' when such a block
    reaches an aggregator (sparse data — any hash partition with no rows).
    This map replaces schema-less empties with a typed empty table and
    column-projects the rest, so join inputs always carry the declared
    schema."""
    import pyarrow as pa

    def fix(t: "pa.Table") -> "pa.Table":
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)
