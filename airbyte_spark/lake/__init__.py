from .table import LakeTable  # noqa: F401
from .merge import merge_batch, MergeStats  # noqa: F401
from .scd import bootstrap_scd_table, scd_merge_batch, ScdMergeStats  # noqa: F401
