"""Distributed layer: row-partitioned matrices + collective sparse ops."""

from .partition import (RowPartitionedCSR, RowPartitionedBucketed,
                        partition_rows, partition_bucketed, partition_vector)
from .ops import (dist_spmv, dist_spmv_bucketed, dist_spmm, dist_spgemm,
                  RowPartitionedCOO)
from .spgemm_a2a import dist_spgemm_a2a
from .spgemm_ring import dist_spgemm_ring

__all__ = [
    "RowPartitionedCSR", "RowPartitionedBucketed", "partition_rows",
    "partition_bucketed", "partition_vector",
    "dist_spmv", "dist_spmv_bucketed", "dist_spmm", "dist_spgemm",
    "dist_spgemm_a2a", "dist_spgemm_ring", "RowPartitionedCOO",
]
