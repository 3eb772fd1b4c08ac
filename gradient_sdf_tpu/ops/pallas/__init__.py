"""Pallas/Mosaic TPU kernels.

Status (round 2): Mosaic cannot lower vectorized gathers/scatters from VMEM
refs ("Cannot do int indexing on TPU"), which rules out the natural fused
fusion/raycast kernels (PERF_NOTES.md). What IS expressible is scalar-driven
row read-modify-write: `scatter_add.scatter_add_rows` implements the fusion
scatter-add that way (dynamic sublane indexing + one-hot lane mask per
sample) so the approach has a concrete measured number instead of a prose
guess — see PERF_NOTES.md "Pallas scatter kernel" for the verdict and
ops/pallas/scatter_add.py for the design constraints.
"""

from . import scatter_add  # noqa: F401
