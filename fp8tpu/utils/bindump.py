"""Binary tensor dumps for offline numerics analysis.

Parity with the reference's bindump plumbing (qutils.py:387-427,
536-541, 552-559; schedule via set_tensor_bindump_schedule,
e5m2_emu.py:368-375): tensors are dumped as raw bit patterns to files
named ``{step}_{module}_{role}_{dims}_{dtype}.bin``, between a start and
end step."""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional

import numpy as np


@dataclasses.dataclass
class BindumpSchedule:
    """Dump window [start_step, end_step) (mpt_emu.py:75-83)."""

    start_step: int = 0
    end_step: int = 0
    directory: str = "./bindump"

    def enabled(self, step: int) -> bool:
        return self.start_step <= step < self.end_step


def bindump_tensor(tensor, step: int, module_name: str, role: str,
                   directory: str = "./bindump") -> str:
    """Write one tensor's raw bits (qutils.py:414-427 naming scheme)."""
    arr = np.asarray(tensor)
    os.makedirs(directory, exist_ok=True)
    dims = "x".join(str(d) for d in arr.shape)
    safe = module_name.replace("/", ".")
    path = os.path.join(
        directory, f"{step}_{safe}_{role}_{dims}_{arr.dtype.name}.bin")
    arr.tofile(path)
    return path


def bindump_tree(tree, step: int, role: str,
                 directory: str = "./bindump") -> list:
    """Dump every floating leaf of a pytree (params/grads snapshot)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    paths = []
    for kp, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        paths.append(bindump_tensor(leaf, step, name, role, directory))
    return paths


class TensorDumpHelper:
    """Pickle-based tensor archiving (qutils.py:387-411,
    stats_collector.py:113-155): accumulate named tensors, dump once."""

    def __init__(self, directory: str = "./tensordump"):
        self.directory = directory
        self._store: dict = {}

    def add(self, name: str, role: str, tensor) -> None:
        self._store.setdefault(name, {}).setdefault(role, []).append(
            np.asarray(tensor))

    def dump(self, filename: str = "tensors.pkl") -> str:
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, filename)
        with open(path, "wb") as f:
            pickle.dump(self._store, f)
        self._store = {}
        return path
