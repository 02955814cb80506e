from .runner import ReplayConfig, run_replay_stream, bootstrap_table  # noqa: F401
