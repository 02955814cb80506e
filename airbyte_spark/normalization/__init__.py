from .codegen import (  # noqa: F401
    generate_normalization_sql,
    normalization_stages,
)
