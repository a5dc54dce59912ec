"""On-device step timing through a high-latency dispatch path.

The axon tunnel (and any remote-dispatch runtime) adds a large constant to
every host-visible synchronization — measured ~29 ms per scalar fetch on
this relay — while `block_until_ready` does not actually block. Timing
``dispatch -> sync`` per iteration therefore charges that constant to the
step. Dispatches pipeline on the device, so the accurate method is the
two-point form used here: time k_hi and k_lo chained dispatches (one sync
each) and divide the difference, cancelling the constant exactly.
"""
from __future__ import annotations

import time

import numpy as np

import jax.numpy as jnp


def sync(x) -> float:
    """Force completion: reduce to a scalar in-graph, fetch it to host."""
    return float(np.asarray(jnp.sum(jnp.asarray(x).astype(jnp.float32))))


def device_rate(dispatch, k_lo: int = 2, k_hi: int = 10, reps: int = 2):
    """Seconds per dispatch with the sync round trip cancelled.

    ``dispatch()`` must issue ONE async device step and return an array to
    sync on (chain state through a closure for stateful steps so the k
    dispatches genuinely run back to back)."""

    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = dispatch()
        sync(out)
        return time.perf_counter() - t0

    run(1)  # warm
    lo = min(run(k_lo) for _ in range(reps))
    hi = min(run(k_hi) for _ in range(reps))
    if hi <= lo:  # relay jitter swamped the signal — retry once, then fall
        lo = min(lo, min(run(k_lo) for _ in range(reps)))
        hi = min(hi, min(run(k_hi) for _ in range(reps)))
    if hi <= lo:
        import warnings

        warnings.warn(
            "device_rate: k_hi run was not slower than k_lo (relay jitter); "
            "falling back to the amortized upper bound hi/k_hi",
            stacklevel=2,
        )
        return hi / k_hi
    return (hi - lo) / (k_hi - k_lo)
