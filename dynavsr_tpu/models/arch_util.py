"""Shared building blocks (reference: models/archs/arch_util.py [H]).

Torch-semantic helpers (explicit padding, count_include_pad pooling,
half-pixel bilinear resize) live here so every arch gets checkpoint-parity
behavior. Residual trunks are expressed with nn.scan over a stacked block —
one compiled body regardless of depth (compile-time win for back_RBs=40).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "Conv",
    "ResidualBlockNoBN",
    "ResTrunk",
    "lrelu",
    "interpolate_bilinear",
    "max_pool_3x3_s2",
    "avg_pool_3x3_s2",
    "kaiming_scaled",
]


def lrelu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.1)


def kaiming_scaled(scale: float = 1.0) -> Callable:
    """Kaiming-normal (fan_in, relu gain) scaled — the reference's
    arch_util.initialize_weights uses scale=0.1 for residual convs [H]."""
    base = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class Conv(nn.Module):
    """Conv2d with torch-style integer padding (explicit, not XLA-SAME).

    XLA 'SAME' pads asymmetrically for even sizes at stride 2; torch pads
    symmetrically — the difference breaks checkpoint parity, so we always
    pad explicitly (SURVEY.md §7 hard-part #3/#4).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    pad: Optional[int] = None  # default: (kernel-1)//2
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = (self.kernel - 1) // 2 if self.pad is None else self.pad
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"  # ~ torch Conv2d default
            ),
            bias_init=self.bias_init or nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)


class ResidualBlockNoBN(nn.Module):
    """conv3x3 -> ReLU -> conv3x3 + identity (reference ResidualBlock_noBN [H]),
    convs initialized kaiming*0.1."""

    nf: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        identity = x
        y = nn.Conv(self.nf, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=kaiming_scaled(0.1), dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.nf, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=kaiming_scaled(0.1), dtype=self.dtype, name="conv2")(y)
        return identity + y


class _ScanResBlock(nn.Module):
    nf: int
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, _unused):
        return ResidualBlockNoBN(self.nf, self.dtype, name="block")(carry), None


class ResTrunk(nn.Module):
    """`n_blocks` ResidualBlockNoBN, rolled with nn.scan.

    Params are stacked along a leading (n_blocks,) axis — the converter
    stacks the reference's per-block tensors to match. One traced block body
    keeps compile time flat in depth; XLA still pipelines across iterations.
    """

    nf: int = 64
    n_blocks: int = 10
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scan = nn.scan(
            _ScanResBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.n_blocks,
        )
        y, _ = scan(nf=self.nf, dtype=self.dtype, name="blocks")(x, None)
        return y


def interpolate_bilinear(x: jax.Array, scale: int) -> jax.Array:
    """Bilinear up/down by integer factor, half-pixel centers
    (torch F.interpolate(..., align_corners=False) semantics).
    x: (..., H, W, C)."""
    shape = x.shape[:-3] + (x.shape[-3] * scale, x.shape[-2] * scale, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


def _pool(x: jax.Array, reducer, init, window: int = 3, stride: int = 2, pad: int = 1):
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    return jax.lax.reduce_window(x, init, reducer, dims, strides, padding)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch nn.MaxPool2d(3, stride=2, padding=1) on NHWC.

    Python-scalar init values are required: JAX only attaches autodiff
    rules to reduce_window when it recognizes the max/add monoid, and that
    detection needs a literal identity element."""
    return _pool(x, jax.lax.max, -jnp.inf)


def avg_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch nn.AvgPool2d(3, stride=2, padding=1) — count_include_pad=True,
    i.e. always divide by 9 (zeros counted) [torch default]."""
    return _pool(x, jax.lax.add, 0.0) / 9.0
