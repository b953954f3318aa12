"""Public deformable-conv op with implementation dispatch.

`deform_conv2d` is the single entry point the models call (reference parity:
models/archs/dcn/deform_conv.py's ModulatedDeformConv / DCN_sep family,
SURVEY.md §2.2 [H]). Implementations:
  - "ref":    pure-JAX gather+einsum (ops/dcn_ref.py) — always available,
              fully differentiable through JAX autodiff.
  - "pallas": fused gather-interpolate-matmul TPU kernel (ops/dcn_pallas.py)
              with a custom VJP; falls back to "ref" off-TPU.
Select globally via set_dcn_impl() or per-call via impl=.
"""

from __future__ import annotations

from typing import Optional

import jax

from dynavsr_tpu.ops.dcn_ref import deform_conv2d_ref

_IMPL = "auto"


def set_dcn_impl(impl: str) -> None:
    global _IMPL
    if impl not in ("auto", "ref", "pallas"):
        raise ValueError(f"unknown dcn impl {impl!r}")
    _IMPL = impl


def _resolve(impl: Optional[str]) -> str:
    choice = impl or _IMPL
    if choice == "auto":
        # Pallas kernel targets TPU; interpret-mode on CPU is only for tests.
        try:
            on_tpu = jax.default_backend() not in ("cpu",)
        except Exception:
            on_tpu = False
        return "pallas" if on_tpu else "ref"
    return choice


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
    if choice == "pallas":
        try:
            from dynavsr_tpu.ops.dcn_pallas import deform_conv2d_pallas
        except ImportError:
            choice = "ref"
    if choice == "pallas":
        return deform_conv2d_pallas(
            x, offset, mask, weight, bias, stride, padding, dilation, groups, deformable_groups
        )
    return deform_conv2d_ref(
        x, offset, mask, weight, bias, stride, padding, dilation, groups, deformable_groups
    )
