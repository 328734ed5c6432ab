from . import config, output  # noqa: F401
