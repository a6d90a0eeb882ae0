"""Checkpoint I/O.

Two tiers (SURVEY.md §5 checkpoint/resume):
  * Per-module export files compatible with the reference CLI surface:
    the same flag-named paths (./vae_encoder.pt etc., train_vae.py:23-26)
    hold flax msgpack bytes; loading transparently accepts either our
    msgpack or an actual reference torch ``state_dict`` file (detected by
    magic bytes and run through utils.torch_import) so reference-trained
    weights drop in.
  * Full training-state checkpoints via orbax: one step-numbered pytree
    (params + optimizer state + PRNG key) with retention, auto-restore of
    the latest step, and async save — the reference saves only module
    weights, never optimizer state (SURVEY.md §5).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional

from flax import serialization


def save_params(path: str, params: Any) -> None:
    """Atomic msgpack write of a param pytree ({'params': ...} or bare)."""
    data = serialization.to_bytes(params)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _is_torch_file(head: bytes) -> bool:
    # torch.save >=1.6 writes a zip ("PK..."); legacy is a pickle (0x80)
    return head.startswith(b"PK") or head[:1] == b"\x80"


def load_params(path: str, target: Any,
                torch_converter: Optional[Callable] = None) -> Any:
    """Load a param pytree; torch state_dict files are converted via the
    given converter (e.g. torch_import.convert_encoder)."""
    with open(path, "rb") as f:
        head = f.read(8)
    if _is_torch_file(head):
        if torch_converter is None:
            raise ValueError(
                f"{path} is a PyTorch checkpoint; pass the matching "
                "utils.torch_import converter to load it"
            )
        from ldm_image_generator_tpu.utils.torch_import import load_state_dict

        return torch_converter(load_state_dict(path))
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


class TrainCheckpointer:
    """Orbax-backed step-numbered training-state checkpoints."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(state_template)
        )

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()
