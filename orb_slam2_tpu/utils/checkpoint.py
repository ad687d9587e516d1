"""Map checkpoint / resume.

The reference's SaveMap/LoadMap is an unimplemented TODO
(`include/System.h:148-151`). Here the whole map is a pytree of arrays, so
persistence is trivial: save/restore the MapState (plus minimal tracker
state) as compressed npz — no serialization code per class, no pointer
fixup. Orbax could be used for async multi-host checkpointing; npz keeps the
artifact portable and dependency-free.
"""
from __future__ import annotations

import numpy as np

from ..mapstate.map import MapState


def save_map(path: str, m: MapState, extra: dict | None = None):
    arrays = {f"map_{k}": np.asarray(v) for k, v in m._asdict().items()}
    if extra:
        for k, v in extra.items():
            arrays[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_map(path: str):
    import jax.numpy as jnp

    data = np.load(path)
    fields = {}
    extra = {}
    for k in data.files:
        if k.startswith("map_"):
            fields[k[4:]] = jnp.asarray(data[k])
        elif k.startswith("extra_"):
            extra[k[6:]] = data[k]
    # forward-compat: checkpoints written before a field existed get defaults
    if "loop_edges" not in fields:
        fields["loop_edges"] = jnp.full((32, 2), -1, jnp.int32)
    if "pt_obs_cnt" not in fields:
        fields["pt_obs_cnt"] = jnp.zeros(fields["pt_valid"].shape, jnp.int32)
    if "pt_forward" not in fields:
        fields["pt_forward"] = jnp.arange(fields["pt_valid"].shape[0],
                                          dtype=jnp.int32)
    from ..mapstate.map import OBS_W, refresh_obs_table
    P = fields["pt_valid"].shape[0]
    for k in ("obs_kf", "obs_ft"):
        if k not in fields:
            fields[k] = jnp.full((P, OBS_W), -1, jnp.int32)
    m = MapState(**fields)
    # derived caches are rebuilt rather than trusted from disk
    m = refresh_obs_table(m)
    return m, extra
