from . import asof, dedup, outliers, sampling, similarity, skew, topk, windows  # noqa: F401
