from . import config, mesh, util  # noqa: F401
