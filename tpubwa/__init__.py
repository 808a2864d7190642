"""tpubwa — a TPU-native BWA-MEM short-read aligner.

A from-scratch reimplementation of the capabilities of
peterpengwei/bwa-mem-quickassist (BWA-MEM with batched accelerator
offload of the banded Smith-Waterman seed extension), re-architected
for TPU: FM-index seeding as batched vectorized occ-table gathers in
JAX, seed extension as a wavefront Pallas kernel, host-orchestrated
chaining / MAPQ / SAM stages, data-parallel scaling over a
jax.sharding.Mesh.  See SURVEY.md for the component map.
"""

__version__ = "0.1.0"

from .opts import MemOpt

__all__ = ["MemOpt", "__version__"]
