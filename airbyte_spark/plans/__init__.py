from .replay import batch_replay, prepare_changes  # noqa: F401
