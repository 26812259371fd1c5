from . import bankcsv, tables, synthetic  # noqa: F401
