from . import pallas_lk  # noqa: F401
