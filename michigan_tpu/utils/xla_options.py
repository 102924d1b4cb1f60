"""Per-program XLA compiler options, relay-safe.

The axon TPU relay client parses ``XLA_FLAGS`` locally and only knows CPU
flags, so TPU backend flags set that way never reach the server-side
compiler.  ``jax.jit(..., compiler_options=...)`` travels WITH the PJRT
compile request instead, so it works through the relay (verified: bogus
flag names are rejected server-side, i.e. the options are really applied).

``MICHIGAN_COMPILER_OPTIONS`` is a comma-separated ``key=value`` list, e.g.::

    MICHIGAN_COMPILER_OPTIONS=xla_tpu_scoped_vmem_limit_kib=65536 python bench.py

Applied to the training-step programs (train_step.py) and the bench
inference program.  Empty/unset means compiler defaults (the config of
record — see PERF.md's flag-search table for why).
"""

from __future__ import annotations

import os


def compiler_options() -> dict | None:
    """Parse MICHIGAN_COMPILER_OPTIONS into a jax.jit compiler_options dict."""
    raw = os.environ.get("MICHIGAN_COMPILER_OPTIONS", "").strip()
    if not raw:
        return None
    out = {}
    for item in raw.split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(
                f"MICHIGAN_COMPILER_OPTIONS entry {item!r} is not key=value")
        k, v = item.split("=", 1)
        out[k.strip()] = v.strip()
    return out or None
