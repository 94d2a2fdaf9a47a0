from . import quat, sampling, vecmath  # noqa: F401
