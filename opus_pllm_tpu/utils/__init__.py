from . import observability  # noqa: F401
