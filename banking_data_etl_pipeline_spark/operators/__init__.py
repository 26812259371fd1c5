from . import errors, dedup, similarity  # noqa: F401
