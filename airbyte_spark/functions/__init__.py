from .text import canonicalize_pandas, canonicalize_udf  # noqa: F401
