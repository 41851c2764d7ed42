"""PointNet spatial transformer (T-Net).

Equivalent of /root/reference/lib/net/transformer.py:13-81: predicts a K x K
affine initialized to identity, applied to the point tensor. The reference
instantiates it in RCNNNet but never calls it in forward (rcnn_net.py:29 —
dead there); provided here for capability parity and standalone use.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ws3d_tpu.models.layers import SharedMLP


class Transformer(nn.Module):
    k: int = 3
    mlp_channels: tuple = (64, 128, 1024)
    fc_channels: tuple = (512, 256)
    use_bn: bool = True

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False,
                 bn_momentum=0.1) -> jnp.ndarray:
        """points (B, N, k) -> (B, k, k) transform (identity-initialized)."""
        h = SharedMLP(list(self.mlp_channels), use_bn=self.use_bn,
                      name="mlp")(points, train=train,
                                  bn_momentum=bn_momentum)
        g = jnp.max(h, axis=1)                               # (B, C)
        for i, c in enumerate(self.fc_channels):
            g = nn.Dense(c, name=f"fc_{i}")(g)
            g = nn.relu(g)
        delta = nn.Dense(self.k * self.k,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="fc_out")(g)
        eye = jnp.eye(self.k, dtype=points.dtype).reshape(1, -1)
        return (delta + eye).reshape(-1, self.k, self.k)


def apply_transform(points: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, k) @ transform (B, k, k) -> (B, N, k)."""
    return jnp.einsum("bnk,bkl->bnl", points, transform)
