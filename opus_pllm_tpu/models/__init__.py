from . import bert, decoder, esm2, layers, opus, text_encoder  # noqa: F401
