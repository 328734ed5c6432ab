from . import quaternion, earth, gpstime, types  # noqa: F401
