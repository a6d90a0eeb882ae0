"""Device mesh + sharding layout for SPMD training/sampling.

The reference has no distributed support at all (SURVEY.md §2: no DDP /
NCCL / process groups — a single torch.device). This module is the
framework's *new* scaling design, built the TPU way: one
``jax.sharding.Mesh`` with named axes

    ('data', 'model')

and ``NamedSharding`` annotations; XLA GSPMD inserts the ICI collectives
(psum for data-parallel gradients, all-gather/reduce-scatter around
model-sharded matmuls). No hand-written communication backend exists or
is needed.

Layout policy:
  * batch axis of activations -> 'data'   (pure DP; v5e-8 default)
  * output-channel axis of large kernels -> 'model'  (tensor parallelism:
    column-parallel matmuls; XLA propagates and inserts collectives)
  * everything else replicated.

Tensor-parallel sharding is applied only to kernels whose output-channel
dim is divisible by the model-axis size and large enough to be worth the
collective (>= MIN_TP_FEATURES), so tiny heads/biases stay replicated.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MIN_TP_FEATURES = 256


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    arr = np.asarray(devices).reshape(n_devices // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def make_multislice_mesh(
    n_devices: Optional[int] = None,
    replicas: int = 1,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """3-axis ('replica', 'data', 'model') mesh for multi-slice pods.

    Axis order encodes network locality: the OUTER 'replica' axis maps
    across slices (DCN links), the inner 'data'/'model' axes stay within
    a slice (ICI). Gradient reduction over ('replica', 'data') then
    lowers hierarchically — XLA reduce-scatters over the fast ICI first
    and all-reduces only the small shards over DCN. Cannot be exercised
    on real multi-slice hardware here; validated on virtual devices
    (tests/test_parallel.py, __graft_entry__.dryrun_multichip)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    per_replica = n_devices // replicas
    assert replicas * per_replica == n_devices, (n_devices, replicas)
    assert per_replica % model_parallel == 0, (per_replica, model_parallel)
    arr = np.asarray(devices).reshape(
        replicas, per_replica // model_parallel, model_parallel
    )
    return Mesh(arr, ("replica", "data", "model"))


def _data_axes(mesh: Mesh):
    """Batch-sharding axes: ('replica','data') on a multi-slice mesh,
    'data' on the 2-axis mesh."""
    return (
        ("replica", "data") if "replica" in mesh.axis_names else "data"
    )


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axes, replicate the
    rest. On a ('replica','data','model') mesh the batch spans both
    replica (DCN) and data (ICI) axes."""
    return NamedSharding(mesh, P(_data_axes(mesh), *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sequence-parallel analogue for images (SURVEY.md §5 long-context
    row): batch over the data axes AND image height over 'model'. XLA
    GSPMD inserts the halo exchanges the 3x3 convs / shifted windows
    need — verified vs single-device numerics in tests/test_parallel.py.
    Use when one image's activations exceed a chip (high-resolution
    training/sampling)."""
    assert ndim >= 3
    return NamedSharding(
        mesh, P(_data_axes(mesh), "model", *([None] * (ndim - 2)))
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _kernel_spec(path_leaf: str, shape, model_size: int,
                 expert_parallel: bool) -> P:
    """Decide the PartitionSpec for one param leaf.

    Default (TP): kernels (Dense [in, out], Conv [kh, kw, in, out],
    stacked MoE [E, in, out]) shard their trailing (output-feature) axis
    over 'model' when divisible and large.
    expert_parallel (EP): 3-D stacked expert tensors ([E, in, out], the
    RandomMoE wa/wb/wc) shard the EXPERT axis over 'model' instead —
    expert weights live distributed and XLA gathers the two selected
    experts' slices per step.
    Biases and small tensors replicate.
    """
    if model_size <= 1 or len(shape) < 2:
        return P()
    if (
        expert_parallel
        and len(shape) == 3
        and shape[0] >= model_size
        and shape[0] % model_size == 0
        and path_leaf in ("wa", "wb", "wc")
    ):
        return P("model", None, None)
    out_features = shape[-1]
    if out_features % model_size != 0 or out_features < MIN_TP_FEATURES:
        return P()
    return P(*([None] * (len(shape) - 1)), "model")


def param_shardings(params: Any, mesh: Mesh,
                    expert_parallel: bool = False) -> Any:
    """NamedSharding tree for a param pytree (TP on big kernels; EP on
    stacked expert tensors when expert_parallel=True)."""
    model_size = mesh.shape["model"]

    def leaf(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        spec = _kernel_spec(name, x.shape, model_size, expert_parallel)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params(params: Any, mesh: Mesh,
                 expert_parallel: bool = False) -> Any:
    """Place a param pytree onto the mesh per param_shardings."""
    shardings = param_shardings(params, mesh, expert_parallel)
    return jax.tree.map(jax.device_put, params, shardings)


# ZeRO-1 leaves smaller than this stay replicated: sharding a tiny
# bias's optimizer moments buys nothing and costs a collective.
ZERO1_MIN_SIZE = 2 ** 14


def zero1_shardings(tree: Any, mesh: Mesh,
                    min_size: int = ZERO1_MIN_SIZE) -> Any:
    """Per-leaf NamedShardings for ZeRO-1 optimizer-state sharding.

    Each large optimizer-state leaf (Adam mu/nu etc.) is sharded over
    the 'data' axis on its largest data-divisible dim; small leaves and
    scalars (step counts) stay replicated. Params and activations keep
    their own layout — annotating only the STATE is what makes this
    ZeRO-1: GSPMD lowers the optimizer update to reduce-scatter(grads)
    -> sharded elementwise update -> all-gather(new params), the
    standard ZeRO-1 dataflow, with no hand-written collectives. The
    reference has no distributed training at all (SURVEY.md §2); this
    is TPU-native scaling surface. Memory effect: Adam's 2x fp32
    moments drop to 2x/N per chip (for the 385.7M default UNet, ~3GB
    of moments -> ~0.4GB/chip on a v5e-8 data axis)."""
    n = mesh.shape["data"]

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()))
        if int(np.prod(shape, dtype=np.int64)) < min_size or n <= 1:
            return replicated(mesh)
        for i in sorted(range(len(shape)), key=lambda j: -shape[j]):
            if shape[i] % n == 0:
                spec = [None] * len(shape)
                spec[i] = "data"
                return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree.map(leaf, tree)


def shard_opt_state(opt_state: Any, mesh: Mesh,
                    min_size: int = ZERO1_MIN_SIZE) -> Any:
    """Place an optimizer-state pytree onto the mesh per
    zero1_shardings (ZeRO-1). Use on tx.init(params) before the first
    step; jit propagates the layout through every update."""
    return jax.tree.map(jax.device_put, opt_state,
                        zero1_shardings(opt_state, mesh, min_size))
