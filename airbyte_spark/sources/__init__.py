from .cursor import (  # noqa: F401
    cursor_tie_count,
    full_refresh_scan,
    incremental_cursor_scan,
)
from .validation import validate_json_records, validation_counts, error_samples  # noqa: F401
from .http import HttpStreamSpec, fetch_with_backoff, read_pages, sliced_fetch  # noqa: F401
