from .cursor import (  # noqa: F401
    cursor_tie_count,
    full_refresh_scan,
    incremental_cursor_scan,
)
from .validation import validate_json_records, validation_counts, error_samples  # noqa: F401
from .http import HttpStreamSpec, fetch_with_backoff, read_pages, sliced_fetch  # noqa: F401
from .singer import (  # noqa: F401
    active_records,
    latest_state,
    parse_singer_lines,
    read_singer_output,
    records as singer_records,
    render_selection_catalog,
    singer_catalog_to_streams,
)
