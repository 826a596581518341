"""Slope-protocol device benchmarking on the axon tunnel.

block_until_ready is a no-op over the tunnel and single fetches pay a
~23 ms round trip, so per-kernel time is measured as the SLOPE of
total time vs number of in-jit chained kernel applications, with one
scalar fetch at the end.  Shared by the in-session kernel experiments.
"""

import time

import numpy as np


def slope_ms(build_chain, ns=(1, 4, 8), reps=3):
    """build_chain(n) -> jitted fn(x)->scalar applying the kernel n times.
    Returns ms per application."""
    totals = []
    for n in ns:
        c = build_chain(n)
        c()  # compile+warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(c())
            ts.append(time.perf_counter() - t0)
        totals.append(np.median(ts))
    # least-squares slope
    ns = np.asarray(ns, np.float64)
    t = np.asarray(totals)
    slope = ((ns - ns.mean()) * (t - t.mean())).sum() / ((ns - ns.mean()) ** 2).sum()
    return 1e3 * slope
