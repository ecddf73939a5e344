from .mesh import make_mesh, reads_sharding, replicated
from .sharded import psum_stats, sharded_fill, split_index_by_code

__all__ = [
    "make_mesh",
    "reads_sharding",
    "replicated",
    "sharded_fill",
    "psum_stats",
    "split_index_by_code",
]
