"""Reproducer: the VAE-GAN train step compiles standalone but its
lax.scan chain crashes this environment's remote compile helper.

Observed 2026-08-17 (axon tunnel): jitting

    lax.scan(lambda s, i: vae_gan_step(s, imgs, key_i), state, arange(n))

with donated state returns HTTP 500 "tpu_compile_helper subprocess exit
code 1" from the remote compile service, while the SAME step jitted
alone (donated, fed back in a Python loop) compiles and runs fine.
micro.py's vae_gan benchmark therefore measures via the dependent-step
loop. The LDM train step (UNet fwd+bwd+AdamW, also containing Pallas
kernels) scans fine at b64 — the failure is specific to this
two-optimizer + VQ-kernel + 512px-conv-stack program under scan.

Each case below runs in its own subprocess (a failed remote compile can
poison later allocations in the process) and prints OK / CRASH:

  single          control: one donated jitted step        (expected OK)
  scan_n8         the failing construction as shipped     (expected CRASH)
  scan_n2         trip count 2 — scan compiles its body once, so if this
                  passes while scan_n8 crashes, the helper's failure is
                  resource-dependent, not a lowering bug
  scan_no_pallas  scan with LDM_TPU_NO_PALLAS=1 — isolates whether the
                  Pallas VQ kernel inside the scanned body is the trigger

Run on the TPU (takes several remote compiles, ~5 min each):

    python benchmarks/scan_compile_repro.py [--case NAME]

Results on this environment (2026-08-17, axon tunnel; re-run to
revalidate after any toolchain change):

    single:         OK — loss: 8.4728
    scan_n8:        CRASH — HTTP 500: tpu_compile_helper exit code 1
    scan_n2:        CRASH — same (NOT trip-count/resource dependent)
    scan_no_pallas: OK — 8 losses printed

i.e. the trigger is the Pallas VQ nearest-neighbor kernel
(kernels/vq.py) lowered INSIDE a lax.scan body: the identical program
with the XLA VQ path scans fine, and the VQ kernel outside scan is fine
(it runs in every production VAE train step). The LDM step's Pallas FFN
kernels scan without issue, so it is kernel-specific, not
Pallas-in-scan generally. Production is unaffected — the real trainers
drive steps from a Python loop (cli/train_vae.py) — but benchmark/eval
code must not wrap the VAE step in lax.scan on this toolchain.
"""
from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = ("single", "scan_n8", "scan_n2", "scan_no_pallas")


def run_case(case: str) -> None:
    import jax
    import jax.numpy as jnp

    from ldm_image_generator_tpu.config import (
        DiscriminatorConfig, VAEConfig,
    )
    from ldm_image_generator_tpu.models import (
        Decoder, Discriminator, Encoder, VectorQuantizer,
    )
    from ldm_image_generator_tpu.train import (
        VAETrainState, make_optimizer, make_vae_train_step,
    )

    key = jax.random.PRNGKey(0)
    vcfg, dcfg = VAEConfig(), DiscriminatorConfig()
    enc = Encoder(vcfg, dtype=jnp.bfloat16)
    dec = Decoder(vcfg, dtype=jnp.bfloat16)
    q = VectorQuantizer(vcfg.num_embeddings, vcfg.embedding_dim)
    disc = Discriminator(dcfg, dtype=jnp.bfloat16)
    crop = 192
    img0 = jnp.zeros((1, crop, crop, 3))
    z0 = jnp.zeros((1, crop // vcfg.downscale, crop // vcfg.downscale,
                    vcfg.latent_channels))
    vp = {
        "encoder": enc.init(key, img0)["params"],
        "decoder": dec.init(key, z0)["params"],
        "quantizer": q.init(
            key, z0.reshape(1, -1, vcfg.embedding_dim))["params"],
    }
    disc_p = disc.init(key, img0)["params"]
    tx_v, tx_d = make_optimizer("adafactor"), make_optimizer("adafactor")
    vstep = make_vae_train_step(enc, dec, q, disc, tx_v, tx_d,
                                crop_size=crop)
    imgs = jax.random.uniform(key, (8, 512, 512, 3), jnp.float32,
                              minval=-1, maxval=1)
    st = VAETrainState(
        vae_params=vp, disc_params=disc_p,
        opt_state_vae=tx_v.init(vp), opt_state_disc=tx_d.init(disc_p),
        step=jnp.zeros((), jnp.int32),
    )

    if case == "single":
        step = jax.jit(vstep, donate_argnums=(0,))
        st, m, _ = step(st, imgs, key)
        print("loss:", float(m["loss"]))
        return

    n = 2 if case == "scan_n2" else 8

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chain(state):
        def body(s, i):
            s, m, _ = vstep(s, imgs, jax.random.fold_in(key, i))
            return s, m["loss"]

        return jax.lax.scan(body, state, jnp.arange(n))

    st, losses = chain(st)
    print("losses:", [round(float(x), 3) for x in losses])


def main():
    if "--case" in sys.argv:
        run_case(sys.argv[sys.argv.index("--case") + 1])
        return
    for case in CASES:
        env = dict(os.environ)
        if case == "scan_no_pallas":
            env["LDM_TPU_NO_PALLAS"] = "1"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case",
             "scan_n8" if case == "scan_no_pallas" else case],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        if r.returncode == 0:
            print(f"{case}: OK — {r.stdout.strip().splitlines()[-1]}",
                  flush=True)
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()
            head = next((l for l in tail if "Error" in l or "error" in l),
                        tail[-1] if tail else "?")
            print(f"{case}: CRASH — {head[:200]}", flush=True)


if __name__ == "__main__":
    main()
