"""Minimal MLP classifier — the smallest end-to-end PTQ slice."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn


class MLP(nn.Module):
    features: Sequence[int] = (256, 256)
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for i, f in enumerate(self.features):
            x = nn.relu(nn.Dense(f, name=f"dense_{i}")(x))
        return nn.Dense(self.num_classes, name="head")(x)
