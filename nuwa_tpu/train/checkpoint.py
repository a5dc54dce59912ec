"""Checkpointing with atomic writes + resume-from-latest.

The reference only saves (``torch.save`` every N steps,
train_vqgan_vae.py:342-351) and never restores; SURVEY §5 calls for full
train-state checkpointing (params, optimizer state, EMA, step, PRNG key) with
crash-safe writes and a resume path — provided here. Serialization uses
flax's msgpack for arbitrary pytrees; writes go to a temp file + atomic
rename so a crash mid-write never corrupts the latest checkpoint.
"""
from __future__ import annotations

import json
import os
import re
import tempfile
from pathlib import Path

import jax
from flax import serialization


def save_checkpoint(directory, name, step, tree):
    """Atomically write ``<dir>/<name>.<step>.msgpack`` and update LATEST."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    tree = jax.device_get(tree)
    payload = serialization.to_bytes(tree)
    final = directory / f"{name}.{step}.msgpack"

    fd, tmp = tempfile.mkstemp(dir=str(directory), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    meta = directory / f"{name}.LATEST"
    fd, tmp = tempfile.mkstemp(dir=str(directory), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump({"step": step, "file": final.name}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, meta)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
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
    pat = re.compile(rf"^{re.escape(name)}\.(\d+)\.msgpack$")
    if directory.exists():
        for f in directory.iterdir():
            m = pat.match(f.name)
            if m:
                step = int(m.group(1))
                if best is None or step > best[0]:
                    best = (step, str(f))
    return best


def load_checkpoint(path, template):
    """Restore a pytree with the same structure as ``template``."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def restore_latest(directory, name, template):
    """Returns (step, tree) or None if nothing to restore."""
    found = latest_checkpoint(directory, name)
    if found is None:
        return None
    step, path = found
    return step, load_checkpoint(path, template)
