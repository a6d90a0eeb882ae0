"""Shared CLI plumbing: device selection, image IO, checkpoint helpers."""
from __future__ import annotations

import os
import sys
from typing import Optional

import numpy as np


def str2bool(v: str) -> bool:
    """Proper boolean flag parsing. The reference uses argparse type=bool,
    where any non-empty string (including 'False') parses as True
    (train_vae.py:27, train_ldm.py:20, sample_ldm.py:17) — fixed here."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "1", "yes", "y", "t"):
        return True
    if v.lower() in ("false", "0", "no", "n", "f", ""):
        return False
    raise ValueError(f"expected a boolean, got {v!r}")


def add_device_arg(parser, default: str = "tpu") -> None:
    parser.add_argument(
        "-d", "--device", default=default,
        choices=["tpu", "cpu", "cuda", "mps"],
        help="Accelerator. 'tpu' (default) uses the JAX default backend; "
        "'cpu' forces the CPU backend; cuda/mps are reference flags kept "
        "for CLI parity and rejected here.",
    )
    # multi-process (multi-host) launch plumbing: the same trainer binary
    # starts on every host with its rank; jax.distributed.initialize runs
    # before any backend use, jax.devices() then spans all hosts, the
    # mesh covers the global device set, and the data loader's per-host
    # striping (data/loader.py) engages automatically via
    # jax.process_index(). Env fallbacks (LDM_COORDINATOR /
    # LDM_PROCESS_ID / LDM_NUM_PROCESSES) serve launchers that can't
    # template flags.
    parser.add_argument(
        "--coordinator", default=None, metavar="HOST:PORT",
        help="multi-process training: coordinator address "
        "(process 0's host); enables jax.distributed.initialize",
    )
    parser.add_argument(
        "--process-id", default=None, type=int, metavar="N",
        help="this process's rank in [0, --num-processes)",
    )
    parser.add_argument(
        "--num-processes", dest="num_processes_dist", default=None,
        type=int, metavar="N",
        help="total number of processes in the job",
    )


def maybe_init_distributed(args=None) -> bool:
    """Call jax.distributed.initialize from CLI flags / env, BEFORE any
    backend initialization. Returns True when running multi-process."""
    get = lambda attr, env, cast: (
        getattr(args, attr, None)
        if args is not None and getattr(args, attr, None) is not None
        else (cast(os.environ[env]) if env in os.environ else None)
    )
    coordinator = get("coordinator", "LDM_COORDINATOR", str)
    process_id = get("process_id", "LDM_PROCESS_ID", int)
    num_processes = get("num_processes_dist", "LDM_NUM_PROCESSES", int)
    if not coordinator and num_processes is None:
        return False
    if not coordinator or process_id is None or not num_processes:
        raise SystemExit(
            "multi-process launch needs all three of --coordinator, "
            "--process-id and --num-processes (or the LDM_* env vars)"
        )
    if num_processes == 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    print(f"distributed: process {process_id}/{num_processes} "
          f"via {coordinator}", flush=True)
    return True


def setup_device(name: str, args=None) -> None:
    print(f"selected device: {name}")
    if name in ("cuda", "mps"):
        print(f"Error: {name} is not available in this environment "
              "(TPU-native framework; use -d tpu or -d cpu).")
        sys.exit(1)
    import jax

    if name == "cpu":
        jax.config.update("jax_platforms", "cpu")
        maybe_init_distributed(args)
        # No persistent compilation cache on CPU: XLA's CPU AOT loader
        # proved unreliable here — loading cached CPU artifacts (even
        # same-host, written minutes earlier by the same process tree)
        # aborted later executions with SIGILL-class crashes, observed
        # deterministically in full test-suite runs. The big cache win
        # is the TPU path's multi-minute compiles anyway.
        return
    # persistent compilation cache: repeat CLI invocations skip the
    # multi-minute XLA compiles (measured init 82s -> 17s on TPU). The
    # path is suffixed with a host fingerprint: AOT artifacts encode the
    # build machine's instruction-set features and a different host's
    # artifacts can crash at execution.
    cache_dir = os.environ.get("LDM_TPU_JAX_CACHE")
    if cache_dir is None:
        import hashlib
        import platform

        sig = platform.machine() + platform.processor()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        sig += line
                        break
        except OSError:
            pass
        host = hashlib.sha1(sig.encode()).hexdigest()[:12]
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", f"ldm_tpu_jax-{host}"
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort
    maybe_init_distributed(args)


def add_diffusion_args(parser, train: bool = False) -> None:
    """Diffusion-process flags shared by the DDPM/LDM train+sample CLIs
    (additive to the reference surface)."""
    parser.add_argument(
        "--prediction", default="eps", choices=["eps", "v"],
        help="model output parameterization; 'v' (arXiv:2202.00512) is "
        "required for --zero-snr",
    )
    parser.add_argument(
        "--zero-snr", action="store_true",
        help="rescale the schedule to zero terminal SNR "
        "(arXiv:2305.08891); needs --prediction v",
    )
    if train:
        parser.add_argument(
            "--ema", default=0.0, type=float, metavar="DECAY",
            help="keep an EMA of the UNet params (e.g. 0.999); saved "
            "next to the model as <modelpath>.ema",
        )
        parser.add_argument(
            "--val-dir", default=None, nargs="+", metavar="DIR",
            help="held-out image directory: evaluate the stratified "
            "validation loss (train/eval.py) every --val-every steps and "
            "log val_loss (+ val_loss_ema) to the JSONL metrics",
        )
        parser.add_argument(
            "--val-every", default=500, type=int, metavar="STEPS",
            help="validation cadence in train steps (with --val-dir)",
        )
        parser.add_argument(
            "--val-batches", default=4, type=int, metavar="N",
            help="number of fixed validation batches to average over",
        )
        # training-stability controls (round-5): the reference recipe
        # (constant AdamW, no clipping, /root/reference/train_ldm.py:67)
        # diverges at production horizons — raw-weight KID rose
        # 1.58 -> 8.13 over 4000 steps (quality/metrics.jsonl r04)
        parser.add_argument(
            "--grad-clip", default=0.0, type=float, metavar="NORM",
            help="global-norm gradient clipping (0 = off, the reference "
            "recipe; 1.0 is the standard diffusion value)",
        )
        parser.add_argument(
            "--lr-schedule", default="constant",
            choices=["constant", "cosine"],
            help="LR schedule; cosine decays to 10%% of -lr over "
            "--total-steps",
        )
        parser.add_argument(
            "--warmup-steps", default=0, type=int, metavar="STEPS",
            help="linear LR warmup steps (0 = none)",
        )
        parser.add_argument(
            "--total-steps", default=0, type=int, metavar="STEPS",
            help="total train steps for the cosine decay horizon "
            "(required with --lr-schedule cosine)",
        )


def ema_path(modelpath: str) -> str:
    return modelpath + ".ema"


def save_image(img_uint8: np.ndarray, path: str) -> None:
    """uint8 HWC -> JPEG/PNG on disk."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(np.asarray(img_uint8), mode="RGB").save(path)


def float_to_image(arr: np.ndarray) -> np.ndarray:
    """[-1,1] float HWC -> uint8 (clamp*127.5+127.5, sample_ldm.py:74-77)."""
    arr = np.clip(np.asarray(arr, dtype=np.float32), -1.0, 1.0)
    return (arr * 127.5 + 127.5).astype(np.uint8)


def maybe_load(path: str, target, torch_converter) -> Optional[object]:
    """Load params from path if it exists (msgpack or torch), else None.

    Validates loaded leaf shapes against the initialized tree up front,
    so an incompatible checkpoint (e.g. a pixel-space 3-channel DDPM
    model passed to the 8-channel LDM sampler) fails with a clear
    message instead of a shape error deep inside a jitted apply."""
    if not os.path.exists(path):
        return None
    from ldm_image_generator_tpu.utils.checkpoint import load_params

    loaded = load_params(path, target, torch_converter)

    import jax

    got = jax.tree.leaves(loaded)
    want = jax.tree.leaves(target)
    for g, w in zip(got, want):
        gs = tuple(getattr(g, "shape", ()))
        ws = tuple(getattr(w, "shape", ()))
        if gs != ws:
            raise SystemExit(
                f"Error: checkpoint {path!r} does not match this model "
                f"config (param shape {gs} vs expected {ws}). Check the "
                f"--config preset and that the checkpoint was trained "
                f"for this model."
            )
    print(f"Loaded checkpoint: {path}")
    return loaded
