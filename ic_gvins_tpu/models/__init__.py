from .gins import GinsModel  # noqa: F401
from .gvins import GvinsModel  # noqa: F401
