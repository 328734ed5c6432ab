from .gins import GinsModel  # noqa: F401
