"""Pallas TPU kernels (placeholder).

A VMEM-resident hash-table lookup kernel was built and validated in
interpret mode during round 1, but Mosaic cannot lower vectorized gathers
from VMEM refs on this toolchain ("Cannot do int indexing on TPU",
jax 0.9 `_canonicalize_transforms_to_indexer`), which also rules out the
per-block image-patch fusion kernel. The voxel store was redesigned around
that constraint instead (dense block directory — see ops/voxel_grid.py and
PERF_NOTES.md). Revisit this package when Mosaic gains dynamic vector
indexing; candidate kernels, in value order:
  1. fused lookup+scatter fusion pass (table + accumulators in VMEM),
  2. projective per-block fusion with DMA'd image patches,
  3. hierarchical-DDA raycast marcher.
"""
