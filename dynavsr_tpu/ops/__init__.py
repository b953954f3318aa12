"""Compute ops: Pallas kernels + pure-JAX references.

The flagship op is the modulated deformable convolution (DCN) behind EDVR's
PCD alignment (reference: models/archs/dcn/src/deform_conv_cuda_kernel.cu,
SURVEY.md §2.2 [H]) — here a gather-interpolate-matmul, with a pure-JAX
reference (dcn_ref) as the parity oracle for the Pallas version (dcn_pallas).
"""

from dynavsr_tpu.ops.grid_sample import bilinear_sample, flow_warp, grid_sample
from dynavsr_tpu.ops.pixelshuffle import pixel_shuffle
from dynavsr_tpu.ops.dcn_ref import deform_conv2d_ref
from dynavsr_tpu.ops.dcn import deform_conv2d
