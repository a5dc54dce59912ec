"""Checkpointing with atomic writes, per-leaf streaming, and mesh-aware
restore.

The reference only saves (``torch.save`` every N steps,
train_vqgan_vae.py:342-351) and never restores; SURVEY §5 calls for full
train-state checkpointing (params, optimizer state, EMA, step, PRNG key) with
crash-safe writes and a resume path — provided here.

Format: an uncompressed zip of one ``.npy`` per pytree leaf (deterministic
flatten order) plus a JSON manifest of key-paths. Leaves are pulled from
device and written ONE AT A TIME, so a multi-GiB train state never needs a
full host-side pytree copy; restore symmetrically ``jax.device_put``s each
leaf straight to its target ``NamedSharding`` (DP/TP/ZeRO layouts) before
touching the next. Writes go to a temp file + atomic rename so a crash
mid-write never corrupts the latest checkpoint. Legacy flax-msgpack
checkpoints (rounds 1-4) still load.
"""
from __future__ import annotations

import io
import json
import os
import re
import tempfile
import zipfile
from pathlib import Path

import numpy as np

import jax


def _key_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(path) for path, _ in flat]


# .npy can only round-trip native numpy dtypes; extension dtypes
# (bfloat16, fp8 variants from ml_dtypes) read back as opaque void ('|V2')
# and are uncastable. Store their BITS as a same-width unsigned int and
# record the true dtype name in the manifest.
_UINT_OF_WIDTH = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def _is_native(dtype) -> bool:
    return np.dtype(dtype).type.__module__ == "numpy"


def _resolve_dtype(name: str):
    try:
        dt = np.dtype(name)
        if dt.kind != "V":
            return dt
    except TypeError:
        pass
    import ml_dtypes

    return np.dtype(getattr(ml_dtypes, name))


def _atomic_write(directory: Path, final: Path, writer):
    fd, tmp = tempfile.mkstemp(dir=str(directory), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            writer(f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_checkpoint(directory, name, step, tree):
    """Atomically write ``<dir>/<name>.<step>.ckpt`` and update LATEST.

    Leaves stream to disk one at a time (device→host→zip), so peak host
    memory is one leaf, not the full train state."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    final = directory / f"{name}.{step}.ckpt"
    leaves = jax.tree.leaves(tree)

    # dtypes are static metadata (no device_get needed up front)
    dtypes = [str(np.dtype(getattr(l, "dtype", np.asarray(l).dtype)))
              for l in leaves]

    def write(f):
        with zipfile.ZipFile(f, "w", zipfile.ZIP_STORED) as zf:
            manifest = {
                "keys": _key_paths(tree), "dtypes": dtypes, "version": 2,
            }
            zf.writestr("manifest.json", json.dumps(manifest))
            for i, leaf in enumerate(leaves):
                arr = np.asarray(jax.device_get(leaf))
                if not _is_native(arr.dtype):
                    # store the raw bits; the manifest keeps the real dtype
                    arr = arr.view(_UINT_OF_WIDTH[arr.dtype.itemsize])
                buf = io.BytesIO()
                np.lib.format.write_array(buf, arr, allow_pickle=False)
                zf.writestr(f"leaf_{i:06d}.npy", buf.getvalue())

    _atomic_write(directory, final, write)

    meta = directory / f"{name}.LATEST"
    payload = json.dumps({"step": step, "file": final.name}).encode()
    _atomic_write(directory, meta, lambda f: f.write(payload))
    return str(final)


def latest_checkpoint(directory, name):
    """Return (step, path) of the newest checkpoint, or None."""
    directory = Path(directory)
    meta = directory / f"{name}.LATEST"
    if meta.exists():
        info = json.loads(meta.read_text())
        path = directory / info["file"]
        if path.exists():
            return info["step"], str(path)
    # fall back to a directory scan (LATEST missing or stale)
    best = None
    pat = re.compile(rf"^{re.escape(name)}\.(\d+)\.(ckpt|msgpack)$")
    if directory.exists():
        for f in directory.iterdir():
            m = pat.match(f.name)
            if m:
                step = int(m.group(1))
                if best is None or step > best[0]:
                    best = (step, str(f))
    return best


def _place(arr, sharding):
    return jax.device_put(arr, sharding) if sharding is not None else arr


def load_checkpoint(path, template, shardings=None):
    """Restore a pytree with the same structure as ``template``.

    ``shardings``: optional pytree of ``jax.sharding.Sharding`` mirroring
    ``template`` — each leaf is ``device_put`` to its sharding as soon as it
    is read, so a DP/TP/ZeRO-sharded train state restores without ever
    holding a full replicated host copy."""
    path = str(path)
    if path.endswith(".msgpack"):  # legacy flax format (rounds 1-4)
        from flax import serialization

        with open(path, "rb") as f:
            tree = serialization.from_bytes(template, f.read())
        if shardings is not None:
            tree = jax.tree.map(_place, tree, shardings)
        return tree

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    shard_leaves = (
        jax.tree.leaves(
            shardings,
            is_leaf=lambda x: hasattr(x, "addressable_devices") or x is None,
        )
        if shardings is not None
        else [None] * len(flat)
    )
    if len(shard_leaves) != len(flat):
        raise ValueError(
            f"shardings pytree has {len(shard_leaves)} leaves but the "
            f"template has {len(flat)} — they must mirror each other "
            "(a partial shardings tree would silently leave trailing "
            "leaves unplaced)"
        )
    with zipfile.ZipFile(path, "r") as zf:
        manifest = json.loads(zf.read("manifest.json"))
        keys = [jax.tree_util.keystr(p) for p, _ in flat]
        if manifest["keys"] != keys:
            raise ValueError(
                f"checkpoint {path} does not match the template pytree: "
                f"{len(manifest['keys'])} saved vs {len(keys)} template leaves"
            )
        saved_dtypes = manifest.get("dtypes")  # absent in version-1 files
        out = []
        for i, ((_, tmpl), sh) in enumerate(zip(flat, shard_leaves)):
            with zf.open(f"leaf_{i:06d}.npy") as f:
                arr = np.lib.format.read_array(f, allow_pickle=False)
            if saved_dtypes is not None:
                true_dtype = _resolve_dtype(saved_dtypes[i])
                if arr.dtype != true_dtype:
                    # extension dtype stored as same-width uint bits
                    arr = arr.view(true_dtype)
            arr = arr.astype(tmpl.dtype) if hasattr(tmpl, "dtype") else arr
            out.append(_place(arr, sh))
    return jax.tree_util.tree_unflatten(treedef, out)


def restore_latest(directory, name, template, shardings=None):
    """Returns (step, tree) or None if nothing to restore."""
    found = latest_checkpoint(directory, name)
    if found is None:
        return None
    step, path = found
    return step, load_checkpoint(path, template, shardings)
