from .alias_table import AliasTable, build_alias_table, sample_alias  # noqa: F401
from .bvh import BVH, build_bvh, get_mtbvh_id  # noqa: F401
