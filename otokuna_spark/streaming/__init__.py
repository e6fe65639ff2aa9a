from . import jobs, stateful  # noqa: F401
