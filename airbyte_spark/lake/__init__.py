from .table import LakeTable  # noqa: F401
from .merge import merge_batch, MergeStats  # noqa: F401
