from .registry import REGISTRY, all_oracles, all_queries, get  # noqa: F401
