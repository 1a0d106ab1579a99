from . import adapters, cstp, losses, projector, splice  # noqa: F401
