from . import asof, dedup, outliers, sampling, similarity, topk, windows  # noqa: F401
