from . import conversation, engine, tokenization  # noqa: F401
