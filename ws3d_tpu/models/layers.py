"""Layer helpers — channel-last flax.linen equivalents of the reference's
pytorch_utils (SharedMLP/Conv1d/Conv2d/FC, pointnet2_lib/pointnet2/
pytorch_utils.py). 1x1 convs become Dense on the trailing channel axis, which
XLA maps onto the MXU as batched matmuls.

BatchNorm takes its (torch-convention) momentum as a *call argument* so the
reference's BN-momentum decay schedule (tools/train_utils/train_utils.py:31-52)
can feed a per-step value without recompilation.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

KAIMING = nn.initializers.he_normal()
XAVIER = nn.initializers.xavier_normal()


class BatchNorm(nn.Module):
    """BatchNorm over all leading axes with torch-style momentum semantics:
    running = (1 - m) * running + m * batch."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, momentum=0.1) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (x - mean) * inv * scale + bias


class SharedMLP(nn.Module):
    """Stack of Dense(+BN)(+ReLU) over the trailing channel axis.

    Equivalent of pt_utils.SharedMLP (1x1 Conv2d stacks) in channel-last
    layout; kaiming init to match the reference's default.

    ``dtype`` sets the matmul compute dtype (bfloat16 puts the Dense layers
    on the MXU at full rate; params and BN statistics stay float32).
    """
    channels: Sequence[int]
    use_bn: bool = True
    activation: Optional[Callable] = nn.relu
    kernel_init: Callable = KAIMING
    dtype: Optional[jnp.dtype] = None
    # keep the compute-dtype output (skip the trailing f32 upcast): for
    # BN-less bf16 stacks whose consumer casts to bf16 anyway (the stage-2
    # up/merge chains), the f32 intermediate is a pure HBM round-trip
    # doubling (268 MB per tensor at 1024x512x128)
    out_f32: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bn_momentum=0.1) -> jnp.ndarray:
        for c in self.channels:
            x = nn.Dense(c, use_bias=not self.use_bn,
                         kernel_init=self.kernel_init, dtype=self.dtype)(x)
            if self.use_bn:
                x = BatchNorm()(x.astype(jnp.float32), train=train,
                                momentum=bn_momentum)
            if self.activation is not None:
                x = self.activation(x)
        return x.astype(jnp.float32) if self.out_f32 else x


class HeadMLP(nn.Module):
    """cls/reg head: hidden Dense(+BN+ReLU) layers with dropout after the
    first, then a linear output layer.

    Mirrors the head construction in rpn.py:20-45 / rcnn_net.py:75-112
    (dropout inserted at position 1) with configurable final-layer init.
    """
    hidden: Sequence[int]
    out_channels: int
    use_bn: bool = True
    dp_ratio: float = 0.0
    final_kernel_init: Callable = KAIMING
    final_bias_init: Callable = nn.initializers.zeros
    kernel_init: Callable = KAIMING
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bn_momentum=0.1) -> jnp.ndarray:
        for i, c in enumerate(self.hidden):
            x = nn.Dense(c, use_bias=not self.use_bn,
                         kernel_init=self.kernel_init, dtype=self.dtype)(x)
            if self.use_bn:
                x = BatchNorm()(x.astype(jnp.float32), train=train,
                                momentum=bn_momentum)
            x = nn.relu(x)
            if i == 0 and self.dp_ratio > 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        return nn.Dense(self.out_channels, kernel_init=self.final_kernel_init,
                        bias_init=self.final_bias_init)(
            x.astype(jnp.float32))
