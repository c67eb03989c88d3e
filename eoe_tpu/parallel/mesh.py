"""Device mesh and sharding layer.

The reference is single-process/single-GPU with no distributed backend at all
(main/__init__.py:110-114 states multi-GPU is unimplemented). This module is
therefore new TPU-native infrastructure rather than a port: it owns

  * ``jax.distributed`` initialization for multi-host pods,
  * a 2-D ``(data, model)`` mesh over ICI,
  * NamedSharding helpers for batch-sharded (data-parallel) training — XLA
    inserts the gradient all-reduce — and optional tensor-parallel parameter
    shardings for the CLIP encoders (rules matched by parameter-path suffix),
  * host->device placement of globally-sharded batches.

DP rides the 'data' axis; TP (CLIP attention/MLP) rides 'model'. PP/EP/CP are
intentionally out of scope for this model family (largest model is CLIP
ViT-B/32; see SURVEY.md §2.7/§5.7).
"""

import dataclasses
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Shape of the device mesh. ``data * model`` must equal #devices used."""
    data: int = -1   # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        if data * model > n_devices:
            raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n_devices}")
        return data, model


_distributed_initialized = False


def init_distributed():
    """Initialize jax.distributed for multi-host pods when EOE_TPU_DISTRIBUTED=1.
    Must run BEFORE anything touches a backend (jax.devices/process_count
    would instantiate the single-process backend first); a no-op otherwise.

    On TPU pods ``jax.distributed.initialize()`` auto-discovers the cluster;
    for explicit clusters (and the 2-process CPU test, tests/test_multihost.py)
    set EOE_TPU_COORD_ADDR=host:port, EOE_TPU_NUM_PROCESSES and
    EOE_TPU_PROCESS_ID."""
    global _distributed_initialized
    if _distributed_initialized:
        return
    _distributed_initialized = True
    if os.environ.get("EOE_TPU_DISTRIBUTED", "0") == "1":
        kwargs = {}
        if os.environ.get("EOE_TPU_COORD_ADDR"):
            kwargs = dict(
                coordinator_address=os.environ["EOE_TPU_COORD_ADDR"],
                num_processes=int(os.environ["EOE_TPU_NUM_PROCESSES"]),
                process_id=int(os.environ["EOE_TPU_PROCESS_ID"]))
        try:
            jax.distributed.initialize(**kwargs)
        except Exception as exc:
            # a misconfigured pod must not silently fall back to one process
            import warnings
            warnings.warn(
                f"EOE_TPU_DISTRIBUTED=1 but jax.distributed.initialize() "
                f"failed ({exc!r}); continuing single-process — shardings "
                f"will NOT span hosts", RuntimeWarning)


def make_mesh(config: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    data, model = config.resolve(len(devices))
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """``device_put`` that also works when the sharding spans devices of
    OTHER processes (multi-process meshes): every process holds the same full
    host value and contributes its addressable shards
    (``make_array_from_callback``). Single-process shardings take the plain
    ``device_put`` fast path. Typed PRNG-key arrays are placed via their
    uint32 key data and re-wrapped on device."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # already a global array (e.g. placed by the trainer's init path):
        # resharding must go through a compiled identity, not host round-trip
        if x.sharding == sharding:
            return x
        return jax.jit(lambda a: a, out_shardings=sharding)(x)
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    import jax.numpy as jnp
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(x))
        dspec = P(*(tuple(sharding.spec) + (None,) * (data.ndim - len(sharding.spec))))
        gdata = put_global(data, NamedSharding(sharding.mesh, dspec))
        impl = jax.random.key_impl(x)
        return jax.jit(lambda d: jax.random.wrap_key_data(d, impl=impl),
                       out_shardings=sharding)(gdata)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: np.ascontiguousarray(x[idx]))


def put_global_tree(tree, sharding: NamedSharding):
    """put_global over every leaf of a pytree (one sharding for all)."""
    return jax.tree_util.tree_map(lambda l: put_global(l, sharding), tree)


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays on the mesh, batch-axis sharded.

    Multi-process (``jax.process_count() > 1``): every process holds the SAME
    full batch on the host (dataset + index plans are deterministic), and each
    uploads ONLY the rows belonging to its addressable devices
    (``make_array_from_process_local_data``) — the host->device traffic per
    process is 1/P of the global batch and no cross-host transfer happens."""
    multi = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        sh = batch_sharding(mesh, max(x.ndim, 1))
        if not multi:
            return jax.device_put(x, sh)
        lo, hi = _local_row_range(sh, x.shape)
        return jax.make_array_from_process_local_data(sh, x[lo:hi], x.shape)
    return jax.tree_util.tree_map(put, batch)


def _local_row_range(sh: NamedSharding, shape) -> Tuple[int, int]:
    """The contiguous [lo, hi) slice of the global batch axis owned by this
    process's addressable devices under a leading-axis sharding."""
    idxs = sh.addressable_devices_indices_map(tuple(shape))
    starts = [(s[0].start or 0) for s in idxs.values()]
    stops = [(s[0].stop if s[0].stop is not None else shape[0]) for s in idxs.values()]
    return min(starts), max(stops)


# ---------------------------------------------------------------- TP rules

# parameter-path suffix -> PartitionSpec. Applied to CLIP encoder params: MLP
# up-projection and attention QKV are sharded on the output feature axis, MLP
# down-projection and attention out on the input feature axis (Megatron-style
# column/row split). Everything else replicates.
_TP_RULES: Sequence[Tuple[Tuple[str, ...], P]] = (
    (("mlp_up", "kernel"), P(None, MODEL_AXIS)),
    (("mlp_up", "bias"), P(MODEL_AXIS)),
    (("mlp_down", "kernel"), P(MODEL_AXIS, None)),
    (("qkv", "kernel"), P(None, MODEL_AXIS)),
    (("qkv", "bias"), P(MODEL_AXIS)),
    (("attn_out", "kernel"), P(MODEL_AXIS, None)),
)


def _spec_for_path(path: Tuple[str, ...], shape: Tuple[int, ...], mesh: Mesh) -> P:
    model_size = mesh.shape[MODEL_AXIS]
    if model_size > 1:
        for suffix, spec in _TP_RULES:
            if len(path) >= len(suffix) and tuple(path[-len(suffix):]) == suffix:
                # only shard if the sharded dim divides evenly
                dims = [d for d, ax in enumerate(spec) if ax == MODEL_AXIS]
                if all(shape[d] % model_size == 0 for d in dims if d < len(shape)):
                    return spec
    return P()


def param_shardings(mesh: Mesh, params) -> Any:
    """NamedSharding pytree for a parameter pytree: TP rules where they apply,
    replicated otherwise."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def one(path_entries, leaf):
        path = tuple(
            getattr(p, "key", getattr(p, "name", getattr(p, "idx", None))) for p in path_entries
        )
        path = tuple(str(p) for p in path if p is not None)
        return NamedSharding(mesh, _spec_for_path(path, tuple(np.shape(leaf)), mesh))

    specs = [one(p, l) for p, l in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, specs)


def cpu_mesh_for_tests(n: int = 8) -> Mesh:
    """A helper for tests/dryruns: mesh over (virtual) CPU devices."""
    devs = [d for d in jax.devices() if d.platform == "cpu"] or jax.devices()
    return make_mesh(MeshConfig(data=min(n, len(devs)), model=1), devs)
