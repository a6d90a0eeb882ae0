"""Granular benchmarks beyond the headline bench.py number.

Each line is JSON: {metric, value, unit, baseline, vs_baseline} where the
baseline is the reference's measured CPU figure from BASELINE.md (null
when the reference has no comparable path, e.g. batched sampling).

Measurement notes: this environment reaches the TPU through a tunnel
whose ``block_until_ready`` does not actually fence, and a fenced
round-trip costs ~25ms. Device-bound steps (denoise, decode) are
therefore measured as a chained lax.scan (one fence for N dependent
steps, see utils.profiling.chained_time); end-to-end sampling is fenced
per call with the image readback included — that IS the user-visible
cost.

Run: python benchmarks/micro.py [--train]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig, VAEConfig
from ldm_image_generator_tpu.utils.profiling import chained_time, fence, time_fn

# BASELINE.md measured reference values (PyTorch CPU eager fp32)
BASE_DENOISE_B1_32 = 0.423      # s/step, batch 1, latent 32x32
BASE_DENOISE_B1_64 = 1.319      # s/step, batch 1, latent 64x64
BASE_DENOISE_B64_32 = 37.1      # s/step, batch 64, latent 32x32
BASE_DECODE = 0.728             # s, (1,8,32,32) -> 256px
BASE_E2E = 1 / 0.092            # s/image, 20 steps + decode


def emit(metric, value, unit, baseline=None):
    rec = {"metric": metric, "value": round(value, 5), "unit": unit,
           "baseline": baseline}
    if baseline:
        rec["vs_baseline"] = round(baseline / value, 1)
    print(json.dumps(rec), flush=True)


def main():
    from ldm_image_generator_tpu.models import Decoder, UNet

    key = jax.random.PRNGKey(0)
    ucfg, vcfg = UNetConfig(), VAEConfig()
    unet = UNet(ucfg, dtype=jnp.bfloat16)
    dec = Decoder(vcfg, dtype=jnp.bfloat16)

    z32 = jnp.zeros((1, 32, 32, 8), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    up = jax.jit(lambda k: unet.init({"params": k, "moe": k}, z32, t1))(key)
    dp = jax.jit(lambda k: dec.init(k, z32))(jax.random.PRNGKey(1))

    rngs = {"moe": jax.random.PRNGKey(2)}

    for batch, latent, base, chain in [(1, 32, BASE_DENOISE_B1_32, 100),
                                       (1, 64, BASE_DENOISE_B1_64, 100),
                                       (64, 32, BASE_DENOISE_B64_32, 20),
                                       (8, 32, None, 50)]:
        x = jax.random.normal(key, (batch, latent, latent, 8), jnp.float32)
        t = jnp.full((batch,), 500, jnp.int32)

        def step(x, up):
            # x -> eps_hat: shape-preserving, so steps chain on-device
            return unet.apply(up, x, t, deterministic=True,
                              rngs=rngs).astype(jnp.float32)

        sec = chained_time(step, x, up, chain_len=chain, iters=3)
        emit(f"unet_denoise_b{batch}_latent{latent}", sec, "s/step", base)

    # decode: chain by feeding a scalar of the output back into the latent
    z = jax.random.normal(key, (1, 32, 32, 8), jnp.float32)

    def dec_step(z, dp):
        y = dec.apply(dp, z)
        return z + 0.0 * jnp.mean(y.astype(jnp.float32))

    sec = chained_time(dec_step, z, dp, chain_len=50, iters=3)
    emit("vae_decode_256px_b1", sec, "s", BASE_DECODE)

    from ldm_image_generator_tpu.pipelines import LDMPipeline

    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.bfloat16)

    # the honest sampler per-step cost: d(e2e)/d(num_steps) on the real
    # pipeline (film cache + bf16 pre-cast + per-step keys); fixed costs
    # (tunnel round-trip, film precompute, decode, readback) cancel
    def e2e(steps, seed):
        img = pipe.sample(up, dp, jax.random.PRNGKey(seed), batch=1,
                          image_size=256, num_steps=steps)
        return jax.device_get(img)

    import time as _t2
    times = {}
    for steps in (20, 100):
        e2e(steps, 0)
        t0 = _t2.perf_counter()
        for i in range(5):
            e2e(steps, i + 1)
        times[steps] = (_t2.perf_counter() - t0) / 5
    emit("sampler_step_b1_latent32", (times[100] - times[20]) / 80,
         "s/step", BASE_DENOISE_B1_32)

    for batch in [1, 8]:
        def run(k):
            img = pipe.sample(up, dp, k, batch=batch, image_size=256,
                              num_steps=20)
            return jax.device_get(img)  # images to host = the deliverable

        sec, _ = time_fn(run, jax.random.PRNGKey(3), iters=5)
        emit(f"ldm_e2e_256px_b{batch}", sec / batch, "s/image",
             BASE_E2E if batch == 1 else None)

    if "--train" in sys.argv:
        import dataclasses
        import time as _t

        from ldm_image_generator_tpu.diffusion import make_schedule
        from ldm_image_generator_tpu.train import (
            LDMTrainState, VAETrainState, make_ldm_train_step,
            make_optimizer, make_vae_train_step,
        )

        schedule = make_schedule(DDPMConfig())

        def timed_train_chain(build_chain, n_steps, iters=2):
            """Compile + run a jitted n-step training scan, fenced; returns
            s/step. The chain carries the train state through dependent
            steps so the device runs back-to-back fwd+bwd+opt."""
            chain = build_chain()
            out = chain()
            fence(out)
            t0 = _t.perf_counter()
            for _ in range(iters):
                out = chain()
                fence(out)
            return (_t.perf_counter() - t0) / (iters * n_steps)

        tx = make_optimizer("adamw", 1e-4)
        state = LDMTrainState(params=up, opt_state=tx.init(up),
                              step=jnp.zeros((), jnp.int32))
        step = make_ldm_train_step(unet, schedule, tx)
        xb = jax.random.normal(key, (8, 32, 32, 8), jnp.float32)

        @jax.jit
        def chain_train(state):
            def body(s, i):
                s, m = step(s, xb, jax.random.fold_in(key, i))
                return s, m["loss"]

            return jax.lax.scan(body, state, jnp.arange(10))

        state2, losses = chain_train(state)
        fence(losses)
        t0 = _t.perf_counter()
        state2, losses = chain_train(state)
        fence(losses)
        emit("ldm_train_step_b8_latent32", (_t.perf_counter() - t0) / 10,
             "s/step", None)
        del state2, losses

        # ---- the reference's documented operating points (round-2
        # verdict item 2): LDM train step at b64 latent-32 (the
        # reference's 37.1 s/step b64 denoise workload, now fwd+bwd+opt)
        # with remat on/off, and the VAE+GAN step at 512px/crop-192
        # (train_vae.py:28,57,109). Baselines from BASELINE.md
        # (benchmarks/ref_train_baseline.py measurements).
        xb64 = jax.random.normal(key, (64, 32, 32, 8), jnp.float32)
        for remat in (False, True):
            ucfg_r = dataclasses.replace(ucfg, remat=remat)
            unet_r = UNet(ucfg_r, dtype=jnp.bfloat16)
            step_r = make_ldm_train_step(unet_r, schedule, tx)
            n = 4

            def build():
                @jax.jit
                def chain(state):
                    def body(s, i):
                        s, m = step_r(s, xb64, jax.random.fold_in(key, i))
                        return s, m["loss"]

                    return jax.lax.scan(body, state, jnp.arange(n))

                st = LDMTrainState(params=up, opt_state=tx.init(up),
                                   step=jnp.zeros((), jnp.int32))
                return lambda: chain(st)

            name = "ldm_train_step_b64_latent32" + ("_remat" if remat else "")
            try:
                sec = timed_train_chain(build, n)
                # 305.96 s/step: measured reference CPU fwd+bwd+opt
                # (benchmarks/ref_train_baseline.py, torch eager)
                emit(name, sec, "s/step", 305.96)
            except Exception as e:
                print(json.dumps({"metric": name,
                                  "error": str(e)[:200]}), flush=True)

        from ldm_image_generator_tpu.config import DiscriminatorConfig
        from ldm_image_generator_tpu.models import (
            Discriminator, Encoder, VectorQuantizer,
        )

        vcfg_t, dcfg_t = VAEConfig(), DiscriminatorConfig()
        enc = Encoder(vcfg_t, dtype=jnp.bfloat16)
        dec2 = Decoder(vcfg_t, dtype=jnp.bfloat16)
        q = VectorQuantizer(vcfg_t.num_embeddings, vcfg_t.embedding_dim)
        disc = Discriminator(dcfg_t, dtype=jnp.bfloat16)
        crop = 192
        img0 = jnp.zeros((1, crop, crop, 3))
        z0 = jnp.zeros((1, crop // vcfg_t.downscale, crop // vcfg_t.downscale,
                        vcfg_t.latent_channels))
        vp = {
            "encoder": enc.init(key, img0)["params"],
            "decoder": dec2.init(key, z0)["params"],
            "quantizer": q.init(
                key, z0.reshape(1, -1, vcfg_t.embedding_dim))["params"],
        }
        disc_p = disc.init(key, img0)["params"]
        tx_v = make_optimizer("adafactor")
        tx_d = make_optimizer("adafactor")
        vstep = make_vae_train_step(enc, dec2, q, disc, tx_v, tx_d,
                                    crop_size=crop)
        imgs512 = jax.random.uniform(key, (8, 512, 512, 3), jnp.float32,
                                     minval=-1, maxval=1)
        n = 8

        def build_vae():
            @jax.jit
            def chain(state):
                def body(s, i):
                    s, m, _ = vstep(s, imgs512, jax.random.fold_in(key, i))
                    return s, m["loss"]

                return jax.lax.scan(body, state, jnp.arange(n))

            st = VAETrainState(
                vae_params=vp, disc_params=disc_p,
                opt_state_vae=tx_v.init(vp),
                opt_state_disc=tx_d.init(disc_p),
                step=jnp.zeros((), jnp.int32),
            )
            return lambda: chain(st)

        try:
            sec = timed_train_chain(build_vae, n)
            # 42.25 s/step: measured reference CPU VAE+GAN step
            # (benchmarks/ref_train_baseline.py, torch eager)
            emit("vae_gan_train_step_b8_512px_crop192", sec, "s/step", 42.25)
        except Exception as e:
            print(json.dumps({"metric": "vae_gan_train_step_b8_512px_crop192",
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
