from . import html, location, multimodal  # noqa: F401
