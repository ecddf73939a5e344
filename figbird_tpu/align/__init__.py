from .core import Aligner, AlignParams, align_batch_device
from .index import KmerIndex, build_index
from .pairing import PairTable, build_pair_table

__all__ = [
    "KmerIndex",
    "build_index",
    "Aligner",
    "AlignParams",
    "align_batch_device",
    "PairTable",
    "build_pair_table",
]
