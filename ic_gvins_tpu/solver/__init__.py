from . import problem, lm  # noqa: F401
