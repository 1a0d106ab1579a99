from . import partition  # noqa: F401
