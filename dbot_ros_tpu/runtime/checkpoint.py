"""Belief checkpoint / resume (aux subsystem, SURVEY.md §5).

The reference has none — tracker state is ephemeral and re-initialization
is interactive. Here the belief pytree (particles, weights, occlusion map,
RNG key / Gaussian moments, background map) serializes to one .npz; resume
is restoring the pytree. Used by the streaming node for periodic
checkpoints and by long evaluations for warm restarts.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from dbot_ros_tpu.filters.rbcpf import ParticleBelief
from dbot_ros_tpu.filters.rgf import GaussianBelief

_KINDS = {"particle": ParticleBelief, "gaussian": GaussianBelief}


def _encode(arr):
    """npz-safe ndarray: ml_dtypes bfloat16 (the fused sensor's occlusion
    storage dtype) is not a builtin numpy dtype, so it round-trips as a
    bit-exact uint16 view plus a name tag."""
    arr = np.asarray(arr)
    if arr.dtype.name == "bfloat16":
        return arr.view(np.uint16), "__bf16"
    return arr, ""


def _decode(name, data):
    import jax.numpy as jnp
    if name + "__bf16" in data:
        return jnp.asarray(data[name + "__bf16"]).view(jnp.bfloat16)
    if name in data:
        return jnp.asarray(data[name])
    return None


def save_belief(path: str, belief) -> None:
    if isinstance(belief, ParticleBelief):
        kind = "particle"
    elif isinstance(belief, GaussianBelief):
        kind = "gaussian"
    else:
        raise TypeError(f"unknown belief type {type(belief)!r}")
    arrays = {}
    for f in dataclasses.fields(belief):
        v = getattr(belief, f.name)
        if v is None:
            continue                      # optional field (e.g. occ_prior)
        leaves = jax.tree_util.tree_leaves(v)
        if len(leaves) == 1 and not isinstance(v, (tuple, list)):
            arr, tag = _encode(v)
            arrays[f.name + tag] = arr
        else:
            # multi-leaf field (e.g. the fused sensor's lazy (q, age)
            # occlusion tuple) → one entry per leaf
            for i, leaf in enumerate(leaves):
                arr, tag = _encode(leaf)
                arrays[f"{f.name}__{i}{tag}"] = arr
    np.savez(path, __kind__=np.array(kind), **arrays)


def load_belief(path: str):
    data = np.load(path, allow_pickle=False)
    kind = str(data["__kind__"])
    cls = _KINDS[kind]
    import jax.numpy as jnp
    kwargs = {}
    for f in dataclasses.fields(cls):
        arr = _decode(f.name, data)
        if arr is not None:
            if f.name == "key":
                # PRNG keys round-trip as raw uint32 key data.
                arr = jax.random.wrap_key_data(arr.astype(jnp.uint32)) \
                    if arr.dtype != jnp.uint32 else arr
            kwargs[f.name] = arr
        else:
            leaves = []
            while True:
                leaf = _decode(f"{f.name}__{len(leaves)}", data)
                if leaf is None:
                    break
                leaves.append(leaf)
            if not leaves:
                if f.default is None:
                    continue             # optional field left at default
                raise KeyError(f"checkpoint missing field {f.name!r}")
            kwargs[f.name] = tuple(leaves)
    return cls(**kwargs)
