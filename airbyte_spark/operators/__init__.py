from .dedup import intra_batch_dedup, latest_per_key, scd2  # noqa: F401
