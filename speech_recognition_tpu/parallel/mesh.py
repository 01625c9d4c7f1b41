"""Device mesh + sharding specs.

The scale-out design SURVEY.md §2.2 prescribes (the reference is
single-process, single-thread — no DP/TP/PP/NCCL anywhere): a 2-D
``jax.sharding.Mesh`` with a ``'data'`` axis for utterance batches and
a ``'model'`` axis for the GMM mixture banks, GSPMD (``jax.jit`` with
shardings) inserting the collectives.  EM sufficient statistics are
plain sums over the frame axis, so sharding the batch turns them into
``psum``s over ICI automatically; sharding the bank's model axis
partitions the emission GEMM.

Multi-host: call :func:`init_distributed` first (wraps
``jax.distributed.initialize``); the same code then runs with global
meshes over all hosts' devices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs) -> None:
    """Multi-host initialization (no-op if already initialized)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def make_mesh(
    shape: Optional[Tuple[int, int]] = None, axes: Tuple[str, str] = ("data", "model")
) -> Mesh:
    """Build a (data, model) mesh over all devices.

    Default shape puts every device on the data axis — right for this
    model family, whose parameters (11 x 5 x 4 x 39 GMMs) fit on any
    chip; pass an explicit shape to shard big mixture banks.
    """
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Utterance-batch arrays: sharded on the leading 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def bank_sharding(mesh: Mesh, shard_models: bool = False) -> NamedSharding:
    """Model-bank arrays: replicated by default; optionally sharded over
    the 'model' axis (leading model dimension)."""
    return NamedSharding(mesh, P("model") if shard_models else P())
