from . import scoring, texttools, vectors, hashing  # noqa: F401
