from . import timecost, logger  # noqa: F401
