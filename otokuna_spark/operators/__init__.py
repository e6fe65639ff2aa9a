from . import asof, dedup, outliers, sampling, similarity, topk  # noqa: F401
