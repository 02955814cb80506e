from .cursor import (  # noqa: F401
    cursor_tie_count,
    full_refresh_scan,
    incremental_cursor_scan,
)
