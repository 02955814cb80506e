from .dedup import intra_batch_dedup, latest_per_key, scd2, scd2_bounded  # noqa: F401
from .temporal import asof_join, asof_lookup  # noqa: F401
from .transcripts import assemble_conversations  # noqa: F401
