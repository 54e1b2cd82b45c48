from .segment import segment_sum, segment_mean, segment_max, segment_softmax
from .spmm import spmm, spmm_xla
from .gcn_norm import gcn_norm, add_self_loops
from .sampling_ops import gumbel_topk, uniform_topk

__all__ = [
    "segment_sum", "segment_mean", "segment_max", "segment_softmax",
    "spmm", "spmm_xla", "gcn_norm", "add_self_loops",
    "gumbel_topk", "uniform_topk",
]
