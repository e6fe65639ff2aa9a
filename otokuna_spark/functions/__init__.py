from . import parsers, text, vectors  # noqa: F401
