"""Pallas-vs-XLA dispatch safety rails.

The block_core / ffn_block VMEM envelopes are calibrated against this
environment's Mosaic build (kernels/block_core.py:_pick_tiles); on a
different TPU generation a shape that passes the envelope could still
fail Mosaic compilation. Two independent rails keep that from taking the
model down:

  * Kill-switch: ``LDM_TPU_NO_PALLAS=1`` (or a comma list of kernel
    names, e.g. ``LDM_TPU_NO_PALLAS=block_core,window_attention``)
    disables the Pallas path(s) outright.
  * Compile probe: ``LDM_TPU_PALLAS_PROBE=1`` makes each dispatcher
    AOT-compile the standalone kernel for the concrete shape signature
    the first time it sees it (try/except, verdict cached per
    signature) and silently take the XLA path when the compile fails.
    Off by default because a probe compile costs one extra XLA/Mosaic
    compilation per kernel signature (minutes on a remote-compile
    tunnel); turn it on when bringing the package up on a new TPU
    generation.

The reference has no analogue (no native kernels to fall back from);
this is a TPU-runtime robustness feature.
"""
from __future__ import annotations

import os
import warnings
from typing import Callable, Tuple

_probe_verdicts: dict = {}


def kill_switched(kernel: str) -> bool:
    v = os.environ.get("LDM_TPU_NO_PALLAS", "").strip()
    if not v or v in ("0", "false"):
        return False
    if v in ("1", "all", "true"):
        return True
    return kernel in [s.strip() for s in v.split(",")]


def probe_enabled() -> bool:
    return os.environ.get("LDM_TPU_PALLAS_PROBE", "").strip() not in (
        "", "0", "false"
    )


def clear_probe_cache() -> None:
    _probe_verdicts.clear()


def pallas_usable(kernel: str, sig: Tuple,
                  compile_thunk: Callable[[], object],
                  force_probe: bool = False) -> bool:
    """Gate a dispatcher's Pallas branch. `sig` must capture everything
    that changes the generated kernel (shapes, dtypes, static flags);
    `compile_thunk` AOT-compiles the kernel for that signature.

    force_probe: probe this signature even when LDM_TPU_PALLAS_PROBE is
    off — used by dispatchers whose default-on envelope was validated
    only for specific shape tuples (e.g. the attention backward's
    hardware-validated (L, C, fold) set) so an unvalidated signature
    can't reach a compiler known to crash on some shapes unprobed."""
    if kill_switched(kernel):
        return False
    if not (probe_enabled() or force_probe):
        return True
    key = (kernel, sig)
    if key not in _probe_verdicts:
        try:
            compile_thunk()
            _probe_verdicts[key] = True
        except Exception as e:  # Mosaic/XLA compile failure of any kind
            warnings.warn(
                f"Pallas kernel {kernel!r} failed to compile for {sig}; "
                f"falling back to the XLA path: {e}"
            )
            _probe_verdicts[key] = False
    return _probe_verdicts[key]
