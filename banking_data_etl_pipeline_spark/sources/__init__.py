from . import bankcsv, synthetic, tables  # noqa: F401
