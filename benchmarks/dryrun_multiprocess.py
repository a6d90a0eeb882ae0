"""Two-process CPU dryrun of the multi-process launch plumbing.

The round-2 verdict: the per-host input striping existed but nothing
could actually START a multi-host job. Round 3 added
--coordinator/--process-id/--num-processes (cli/common.
maybe_init_distributed) calling jax.distributed.initialize before
backend init. This harness proves the whole path end to end without a
cluster:

  * parent spawns two local processes, each with 4 virtual CPU devices
    (xla_force_host_platform_device_count), rank 0 hosting the
    coordinator;
  * each process initializes jax.distributed, sees the 8 GLOBAL
    devices, builds the ('data','model') mesh over them, assembles its
    local stripe of the global batch via
    jax.make_array_from_process_local_data (the data/loader.py
    multi-host path), and runs ONE jitted LDM train step — GSPMD
    inserts the cross-process gradient psum;
  * the parent also runs a single-process 8-device reference and
    checks loss + a param checksum agree across ranks and match the
    reference.

Run: python benchmarks/dryrun_multiprocess.py
Writes MULTIPROC_r03.json at the repo root ({"ok": true, ...}).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 8  # global


def run_one_step(rank: int, nproc: int, port: int):
    """Build a tiny conditioned LDM train step over the global mesh and
    run one step; returns (loss, param_checksum, n_global_devices)."""
    local_devices = 8 // nproc
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        # the real CLI path: flags -> jax.distributed.initialize
        from ldm_image_generator_tpu.cli.common import (
            maybe_init_distributed,
        )

        class Args:
            coordinator = f"127.0.0.1:{port}"
            process_id = rank
            num_processes_dist = nproc

        assert maybe_init_distributed(Args())

    import jax.numpy as jnp
    import numpy as np

    from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig
    from ldm_image_generator_tpu.diffusion import make_schedule
    from ldm_image_generator_tpu.models import UNet
    from ldm_image_generator_tpu.parallel import batch_sharding, make_mesh
    from ldm_image_generator_tpu.train import (
        LDMTrainState,
        make_ldm_train_step,
        make_optimizer,
    )

    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 global devices, got {len(devs)}"
    assert jax.process_count() == nproc

    cfg = UNetConfig(input_channels=4, channels=(8, 16), stages=(1, 1),
                     head_dim=4)
    unet = UNet(cfg)
    key = jax.random.PRNGKey(0)
    z0 = jnp.zeros((1, 16, 16, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    params = unet.init({"params": key, "moe": key, "sd": key}, z0, t0)

    # identical global batch on every process (shared seed), then each
    # process contributes only its stripe — the loader's multi-host
    # contract (data/loader.py)
    x_global = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (BATCH, 16, 16, 4))
    )
    mesh = make_mesh(len(devs))
    sharding = batch_sharding(mesh, 4)
    if nproc > 1:
        per = BATCH // nproc
        local = x_global[rank * per:(rank + 1) * per]
        x = jax.make_array_from_process_local_data(sharding, local)
    else:
        x = jax.device_put(x_global, sharding)

    tx = make_optimizer("adamw", 1e-3)
    state = LDMTrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))
    step = jax.jit(make_ldm_train_step(
        unet, make_schedule(DDPMConfig(num_timesteps=100)), tx))
    state, metrics = step(state, x, jax.random.PRNGKey(2))

    loss = float(metrics["loss"])
    checksum = float(sum(
        jnp.sum(jnp.abs(leaf.astype(jnp.float64)))
        for leaf in jax.tree.leaves(state.params)
    ))
    return loss, checksum, len(devs)


def child_main(rank: int, nproc: int, port: int) -> None:
    loss, checksum, ndev = run_one_step(rank, nproc, port)
    print(json.dumps({"rank": rank, "nproc": nproc, "loss": loss,
                      "checksum": checksum, "devices": ndev}), flush=True)


def parent_main() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(rank), "--nproc", "2", "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for rank in (0, 1)
    ]
    outs = []
    ok = True
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            print(err[-2000:], file=sys.stderr)
            ok = False
            continue
        outs.append(json.loads(out.strip().splitlines()[-1]))

    result = {"ok": False, "nproc": 2, "ranks": outs}
    if ok and len(outs) == 2:
        # single-process reference in a fresh interpreter
        ref_p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", "-1",
             "--nproc", "1", "--port", "0"],
            capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
        )
        ref = json.loads(ref_p.stdout.strip().splitlines()[-1])
        result["reference"] = ref
        same_across_ranks = (
            abs(outs[0]["loss"] - outs[1]["loss"]) < 1e-6
            and abs(outs[0]["checksum"] - outs[1]["checksum"]) < 1e-4
        )
        matches_reference = (
            abs(outs[0]["loss"] - ref["loss"]) < 1e-5
            and abs(outs[0]["checksum"] - ref["checksum"])
            < 1e-3 + 1e-6 * abs(ref["checksum"])
        )
        result["ok"] = bool(same_across_ranks and matches_reference)
        result["same_across_ranks"] = bool(same_across_ranks)
        result["matches_reference"] = bool(matches_reference)

    with open(os.path.join(REPO, "MULTIPROC_r03.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        rank = int(sys.argv[i + 1])
        nproc = int(sys.argv[sys.argv.index("--nproc") + 1])
        port = int(sys.argv[sys.argv.index("--port") + 1])
        child_main(rank, max(nproc, 1), port)
    else:
        sys.exit(parent_main())
