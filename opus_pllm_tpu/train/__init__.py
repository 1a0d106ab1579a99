from . import cstp_trainer, multimodal_trainer, optim  # noqa: F401
