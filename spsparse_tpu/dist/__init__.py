"""Distributed layer: row-partitioned matrices + collective sparse ops."""

from .partition import RowPartitionedCSR, partition_rows, partition_vector
from .ops import dist_spmv, dist_spmm, dist_spgemm, RowPartitionedCOO

__all__ = [
    "RowPartitionedCSR", "partition_rows", "partition_vector",
    "dist_spmv", "dist_spmm", "dist_spgemm", "RowPartitionedCOO",
]
