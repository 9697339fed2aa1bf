from .registry import REGISTRY, QuerySpec, all_oracles, all_queries, query

__all__ = ["REGISTRY", "QuerySpec", "all_oracles", "all_queries", "query"]
