"""figbird_tpu — TPU-native iterative genome gap filling.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Figbird
(Tarafder et al., Bioinformatics 2022; reference C++/bash pipeline at
github.com/SumitTarafder/Figbird): filling N-gaps in draft assemblies from
paired-end reads by iterative probabilistic read distribution.

Subpackages
-----------
io        FASTA/FASTQ parsing into dense int8 batches
align     in-house seed-and-extend aligner (replaces bowtie2)
model     insert-size / error model learning as XLA ops
triage    read->gap assignment geometry (replaces Preprocess.cpp)
fill      batched GapFiller EM (replaces Figbird.cpp core)
parallel  mesh / sharding / collectives for multi-chip scale-out
"""

from .config import FigbirdConfig, Parameters, ReadLibrary
from .genome import GapInfo, Genome

__all__ = [
    "FigbirdConfig",
    "Parameters",
    "ReadLibrary",
    "Genome",
    "GapInfo",
]

__version__ = "0.1.0"
