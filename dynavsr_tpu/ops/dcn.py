"""Public deformable-conv op with implementation dispatch.

`deform_conv2d` is the single entry point the models call (reference parity:
models/archs/dcn/deform_conv.py's ModulatedDeformConv / DCN_sep family,
SURVEY.md §2.2 [H]). Implementations:
  - "fused" (default): memory-lean tap-scan gather-interpolate-matmul
              (ops/dcn_fused.py) — never materializes im2col columns;
              rematerialized backward with a save-gather policy for small
              blocks. The production path for training AND serving (the
              fastest measured on every workload).
  - "pipelined": identical numerics, experimental schedule that carries
              the gathered block across the frame scan. SUPERSEDED by the
              default's save-gather policy + j-major layout — measured
              slower everywhere (see dcn_fused.py / ROOFLINE.md); kept as
              the documented scheduling experiment.
  - "ref":    pure-JAX im2col gather+einsum (ops/dcn_ref.py) — the parity
              oracle; O(B*HW*K*C) memory, test use only.
Select globally via set_dcn_impl() or per-call via impl=.
"""

from __future__ import annotations

from typing import Optional

import jax

from dynavsr_tpu.ops.dcn_fused import deform_conv2d_fused, deform_conv2d_pipelined
from dynavsr_tpu.ops.dcn_ref import deform_conv2d_ref

_IMPL = "auto"
_FNS = {
    "fused": deform_conv2d_fused,
    "pipelined": deform_conv2d_pipelined,
    "ref": deform_conv2d_ref,
}


def set_dcn_impl(impl: str) -> None:
    global _IMPL
    if impl not in ("auto",) + tuple(_FNS):
        raise ValueError(f"unknown dcn impl {impl!r}")
    _IMPL = impl


def _resolve(impl: Optional[str]) -> str:
    choice = impl or _IMPL
    return "fused" if choice == "auto" else choice


def deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    mask: Optional[jax.Array],
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    groups: int = 1,
    deformable_groups: int = 1,
    impl: Optional[str] = None,
) -> jax.Array:
    """Modulated (mask != None) or plain (mask=None) deformable conv.

    x: (B, H, W, Cin) NHWC; offset: (B, Ho, Wo, 2*Gd*K) CUDA-interleaved
    (dy, dx) per (group, tap); mask: (B, Ho, Wo, Gd*K) post-sigmoid;
    weight: HWIO.
    """
    choice = _resolve(impl)
    fn = _FNS[choice]
    return fn(
        x, offset, mask, weight, bias, stride, padding, dilation, groups, deformable_groups
    )
