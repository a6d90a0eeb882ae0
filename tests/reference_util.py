"""Helpers for golden-parity tests against the reference implementation.

The read-only reference tree (/root/reference) is imported as the oracle:
we run its torch modules on CPU and assert our JAX modules produce the
same numerics through the converted weights (SURVEY.md §4, fidelity gate).
Nothing from the reference is vendored — it is imported in tests only.
"""
import sys

REFERENCE_DIR = "/root/reference"

_added = False


def import_reference(module_name: str):
    global _added
    if not _added:
        sys.path.insert(0, REFERENCE_DIR)
        _added = True
    import importlib

    return importlib.import_module(module_name)


def to_nhwc(t):
    """torch NCHW tensor -> numpy NHWC array."""
    return t.detach().cpu().numpy().transpose(0, 2, 3, 1)


def from_nhwc(a):
    """numpy NHWC array -> torch NCHW tensor."""
    import torch

    return torch.from_numpy(a.transpose(0, 3, 1, 2).copy())
