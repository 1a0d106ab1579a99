from . import collate, datasets, precompute  # noqa: F401
