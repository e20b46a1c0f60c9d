from . import linear, evalmod, bootstrap  # noqa: F401
