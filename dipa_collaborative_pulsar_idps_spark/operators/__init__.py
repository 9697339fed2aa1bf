from .asof import asof_join
from .deltas import counter_delta
from .topk import top_k, top_k_per_group

__all__ = ["counter_delta", "asof_join", "top_k", "top_k_per_group"]
