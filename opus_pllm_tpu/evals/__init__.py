from . import datasets, mcq, metrics, runner, textproc  # noqa: F401
