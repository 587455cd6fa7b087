"""Kernel/op library: top-k, gather/scatter, matmul, shape ops, registry.

Importing this package registers every built-in op with the registry
(the analog of MAX loading ``custom_extensions=[operations/]``,
``/root/reference/graph.py:55``).
"""

from bm25_tpu.ops.registry import custom, get_op, list_ops, register_op
from bm25_tpu.ops import topk as _topk
from bm25_tpu.ops import gather_scatter as _gs
from bm25_tpu.ops import matmul as _mm
from bm25_tpu.ops import shape_ops as _so
from bm25_tpu.ops import gather_rows as _gr
from bm25_tpu.ops import ell_score as _es

from bm25_tpu.ops.ell_score import ell_score
from bm25_tpu.ops.gather_rows import gather_add_rows
from bm25_tpu.ops.topk import (
    select_top_k,
    top_k,
    top_k_blockwise,
    top_k_fused_sampling,
    top_k_tree,
)
from bm25_tpu.ops.gather_scatter import (
    gather,
    gather_elements,
    gather_nd,
    gather_nd_shape,
    gather_reduce,
    gather_shape,
    scatter_elements,
    scatter_nd,
    scatter_nd_shape,
)
from bm25_tpu.ops.matmul import matmul
from bm25_tpu.ops.shape_ops import arange, arange_shape, reshape, reshape_shape

__all__ = [
    "custom", "get_op", "list_ops", "register_op",
    "top_k", "top_k_fused_sampling", "top_k_blockwise", "top_k_tree",
    "select_top_k", "ell_score", "gather_add_rows",
    "gather", "gather_elements", "gather_nd", "gather_nd_shape",
    "gather_reduce", "gather_shape",
    "scatter_elements", "scatter_nd", "scatter_nd_shape",
    "matmul", "arange", "arange_shape", "reshape", "reshape_shape",
]
