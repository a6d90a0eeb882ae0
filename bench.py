"""Benchmark: end-to-end LDM sampling throughput on real hardware.

Prints one JSON line per metric, the HEADLINE metric LAST (the driver
parses the final line): 256px LDM sampling, 20 DDIM steps + VAE decode,
batch 1. Baselines are the reference's measured CPU numbers
(BASELINE.md metric 1, path sample_ldm.py:71-75; the 512px figure was
measured the same way at the reference's documented default size,
sample_ldm.py:19).

Our pipeline runs the whole chain as one jitted program (see
ldm_image_generator_tpu/pipelines.py). Weights are randomly initialized —
identical compute graph/FLOPs as trained weights.

Methodology (round 4): this host has ONE shared CPU core with heavy
steal — single measurements vary up to ±60% (CLAUDE.md), and round 3's
single-shot artifact recorded a -21% host-steal episode as the official
number. Each metric now runs TRIALS interleaved trials (512px and 256px
alternate, so a steal episode hits both rather than biasing one) and
reports the MEDIAN, with per-trial values in the record.
"""
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMAGES_PER_S = 0.092       # 256px e2e, reference CPU (BASELINE.md)
# 512px e2e reference baseline: direct measurement of sample_ldm.py's path
# (20 DDIM steps + Decoder at latent 64) gave 41.5s/image = 0.0241 img/s;
# composing BASELINE.md's cleaner per-step figure (1.319 s/step x 20) with
# the measured 4.68s decode gives 31.1s = 0.0322 img/s. We quote the
# faster composition as the baseline to stay conservative.
BASELINE_512_IMAGES_PER_S = 0.0322

TRIALS = 3
ITERS_PER_TRIAL = 5
SPREAD_TOL = 0.10      # max (max-min)/median across a metric's trials
MAX_EXTRA_TRIALS = 3   # re-trial rounds before declaring spread_ok false


def make_runner(pipe, unet_params, dec_params, batch, image_size):
    def run(seed):
        imgs = pipe.sample(
            unet_params, dec_params, jax.random.PRNGKey(seed),
            batch=batch, image_size=image_size, num_steps=20,
        )
        # fetch images to host: that's the user-visible deliverable, and
        # the only reliable fence on this tunneled backend (its
        # block_until_ready can return before the device finishes)
        return jax.device_get(imgs)

    return run


def one_trial(run, batch, image_size, trial):
    start = time.perf_counter()
    for i in range(ITERS_PER_TRIAL):
        out = run(1 + trial * ITERS_PER_TRIAL + i)
    elapsed = time.perf_counter() - start
    assert out.shape == (batch, image_size, image_size, 3)
    return (ITERS_PER_TRIAL * batch) / elapsed


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    pipe = LDMPipeline()  # default 385.7M UNet + default VAE decoder, bf16
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 32, 32, 8), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    unet_params = jax.jit(
        lambda k: pipe.unet.init({"params": k, "moe": k}, z, t)
    )(key)
    dec_params = jax.jit(lambda k: pipe.decoder.init(k, z))(
        jax.random.PRNGKey(1)
    )

    sizes = (512, 256)
    runners = {s: make_runner(pipe, unet_params, dec_params, batch, s)
               for s in sizes}
    for s in sizes:
        runners[s](0)  # warmup / compile
    trials = {s: [] for s in sizes}
    for trial in range(TRIALS):
        for s in sizes:  # interleaved: host steal hits both metrics
            trials[s].append(one_trial(runners[s], batch, s, trial))

    # Spread-validity policy (round 5): a >10% trial spread means a
    # host-steal episode contaminated the window (the r03 10.41
    # artifact) — re-trial up to MAX_EXTRA times instead of publishing
    # the noise; if it never settles, the record says spread_ok: false
    # rather than leaving forensics to the next round.
    spread_frac = lambda v: (max(v) - min(v)) / statistics.median(v)
    extra = 0
    while (any(spread_frac(trials[s]) > SPREAD_TOL for s in sizes)
           and extra < MAX_EXTRA_TRIALS):
        extra += 1
        for s in sizes:
            trials[s].append(one_trial(runners[s], batch, s,
                                       TRIALS - 1 + extra))

    # DeepCache variant (NOT the headline): deep-core reuse at interval
    # 2 (pipelines.sample cache_interval; quality delta measured by
    # benchmarks/quality_gate.py's deepcache pass). Exact-numerics
    # metrics above stay the headline.
    def run_dc(seed):
        return jax.device_get(pipe.sample(
            unet_params, dec_params, jax.random.PRNGKey(seed),
            batch=batch, image_size=256, num_steps=20, cache_interval=2,
        ))

    run_dc(0)  # compile
    dc_trials = []
    for trial in range(TRIALS):
        t0 = time.perf_counter()
        for i in range(ITERS_PER_TRIAL):
            run_dc(200 + trial * ITERS_PER_TRIAL + i)
        dc_trials.append(
            ITERS_PER_TRIAL * batch / (time.perf_counter() - t0))
    print(json.dumps({
        "metric": f"ldm_sample_256px_deepcache2_images_per_s_batch{batch}",
        "value": round(statistics.median(dc_trials), 4),
        "unit": "images/s",
        "vs_baseline": round(statistics.median(dc_trials)
                             / BASELINE_IMAGES_PER_S, 2),
        "trials": [round(v, 4) for v in dc_trials],
    }), flush=True)

    # Pipelined-dispatch variant (NOT the headline): issue all sampling
    # calls, then fetch — what any production client (or the serving
    # daemon) does, hiding the ~45ms/call tunnel round-trip behind
    # device compute. Reported as its own metric; the headline below
    # stays strictly sequential (dispatch -> fetch per image) for
    # round-over-round comparability.
    def pipelined(batch, image_size, n=10):
        outs = [pipe.sample(unet_params, dec_params, jax.random.PRNGKey(100 + i),
                            batch=batch, image_size=image_size, num_steps=20)
                for i in range(n)]
        got = [jax.device_get(o) for o in outs]
        assert got[-1].shape == (batch, image_size, image_size, 3)

    pipelined(batch, 256, n=2)  # warmup the path
    pl_trials = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        pipelined(batch, 256)
        pl_trials.append(10 * batch / (time.perf_counter() - t0))
    print(json.dumps({
        "metric": f"ldm_sample_256px_pipelined_images_per_s_batch{batch}",
        "value": round(statistics.median(pl_trials), 4),
        "unit": "images/s",
        "vs_baseline": round(statistics.median(pl_trials)
                             / BASELINE_IMAGES_PER_S, 2),
        "trials": [round(v, 4) for v in pl_trials],
    }), flush=True)

    import os as _os

    load1 = _os.getloadavg()[0] if hasattr(_os, "getloadavg") else None
    base = {512: BASELINE_512_IMAGES_PER_S, 256: BASELINE_IMAGES_PER_S}
    for s in sizes:  # 256px last: the driver parses the final line
        ips = statistics.median(trials[s])
        print(json.dumps({
            "metric": f"ldm_sample_{s}px_images_per_s_batch{batch}",
            "value": round(ips, 4),
            "unit": "images/s",
            "vs_baseline": round(ips / base[s], 2),
            "trials": [round(v, 4) for v in trials[s]],
            "spread": [round(min(trials[s]), 4), round(max(trials[s]), 4)],
            "spread_ok": bool(spread_frac(trials[s]) <= SPREAD_TOL),
            "retrial_rounds": extra,
            "host_load1": round(load1, 2) if load1 is not None else None,
        }), flush=True)


if __name__ == "__main__":
    main()
