from . import basic, preint_factor, reprojection, robust  # noqa: F401
