from .session import configure, get_spark  # noqa: F401
