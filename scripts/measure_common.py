"""Shared measurement helpers for the on-chip analysis scripts
(roofline.py, traffic_split.py, ab_*.py).

Measurement discipline (ROADMAP): through the axon tunnel a single dispatch
has a ~26-28 ms RTT floor, so every timing is a chained-dispatch slope
(t_n - t_1)/(n-1) with a scalar readback; XLA's own post-fusion
`cost_analysis()` supplies flops / bytes-accessed for the roofline
`t_floor = max(flops/peak, bytes/HBM_bw)`.
"""

import time

import jax

V5E_BF16_PEAK = 197e12  # flops/s per chip
V5E_HBM_BW = 819e9  # bytes/s


def cost(compiled):
    """(flops, bytes_accessed) from XLA's post-fusion cost analysis."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def timed_slope(dispatch, n=5):
    """(t_n - t_1)/(n-1) over async-queued dispatches, scalar readback."""
    out = dispatch()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = dispatch()
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    outs = [dispatch() for _ in range(n)]
    jax.block_until_ready(outs[-1])
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n - 1)


# traffic_split.py historically named the same timer `slope`
slope = timed_slope
