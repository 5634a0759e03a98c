from . import bp1  # noqa: F401
