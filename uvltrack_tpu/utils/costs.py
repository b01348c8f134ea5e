"""Compiled-cost extraction for MFU accounting.

The bench reports MFU = compiled-cost FLOPs/frame x measured FPS / peak
(the TPU-native perf yardstick; the reference publishes FPS only,
tracking/profile_model.py:30-47). FLOPs come from XLA's cost analysis of
the EXACT program the bench timed — not an analytic estimate — so kernel
or fusion changes show up in the MFU number automatically.
"""

from __future__ import annotations


def compiled_cost(jitted, *args) -> dict:
    """Lower+compile `jitted` for `args` and return {"flops", "bytes"}.

    Uses the persistent compile cache when configured, so calling this
    after the function already ran is cheap (trace + cache hit). The
    cost_analysis return shape varies across jax versions (dict, or a
    per-device list of dicts) — normalized here once.
    """
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))
    return {"flops": flops, "bytes": nbytes}
