"""Shared Dataset.join wrapper.

Ray 2.49's hash-join reserves min(1, (CPU/2)/nparts) logical CPUs PER
PARTITION on its aggregator actors; two 16-partition joins in one DAG
reserve ~4 CPUs of placement tokens and deadlock a 4-CPU cluster (the
upstream map/sort tasks can never schedule). Actor num_cpus is a placement
token only — aggregators timeshare the host regardless — so pinning it tiny
is safe and keeps low-CPU configs live."""

from __future__ import annotations


def dsjoin(left, right, join_type, num_partitions, on, right_on=None):
    return left.join(
        right,
        join_type,
        num_partitions,
        on=on,
        right_on=right_on,
        aggregator_ray_remote_args={"num_cpus": 0.01},
    )
