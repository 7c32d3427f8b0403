from .searcher import OracleSearcher  # noqa: F401
