from .asof import asof_join
from .layout import interleave_bits, zorder_by
from .rangejoin import interval_join
from .topk import topk_per_group, topk_per_group_window

__all__ = [
    "asof_join",
    "interval_join",
    "interleave_bits",
    "zorder_by",
    "topk_per_group",
    "topk_per_group_window",
]
