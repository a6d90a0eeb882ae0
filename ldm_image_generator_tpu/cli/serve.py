"""Serving daemon: HTTP front-end over the dynamic-batching sampler.

The reference has no serving path (its sampler is a sequential batch-1
script, sample_ldm.py:71); this is additive TPU-first capability: on one
chip, batched sampling is ~5x the batch-1 throughput, so concurrent
requests are coalesced into fixed jitted batch buckets
(ldm_image_generator_tpu/serving.py).

    python -m ldm_image_generator_tpu.cli.serve -dp ddpm.pt -decp dec.pt \
        --port 8080 --buckets 1 2 4 8

    GET  /healthz                          -> {"ok": true, stats...}
    GET  /stats                            -> full counters + latency
                                              histograms (p50/p90/p99)
    GET  /metrics                          -> Prometheus text exposition
                                              (counters, queue gauges,
                                              latency + queue-wait
                                              histograms in seconds)
    GET  /sample?seed=123[&size=512][&class_id=7][&guidance_scale=3.0]
                 [&cfg_rescale=0.7][&negative_class=2]
                 [&priority=high|normal|low][&steps=10]
                                           -> image/jpeg
    GET  /sample_batch?seeds=1,2,3 | seed=40&n=8  [+ the same options]
                                           -> multipart/mixed stream:
                                              one image/jpeg part per
                                              seed (X-Seed header), in
                                              COMPLETION order — all
                                              seeds batch on-device,
                                              the client renders each
                                              image as it finishes
    POST /sample  {"seed": 123, "size": 512, "class_id": 7,
                   "guidance_scale": 3.0, "cfg_rescale": 0.7,
                   "priority": "low"}
                                           -> image/jpeg
    POST /sample_batch {"items": [{"seed": 1, "class_id": 3},
                                  {"seed": 2, "guidance_scale": 2.0},
                                  ...], ...per-request defaults}
                       | {"seeds": [1, 2, 3], ...shared options}
                                           -> multipart/mixed stream
                                              (X-Index + X-Seed parts):
                                              a HETEROGENEOUS batch —
                                              every item carries its own
                                              options; items on the same
                                              cost bucket still coalesce
                                              into one device batch
    POST /img2img {"seed": 1, "image": "<base64>"[, "size", "class_id",
                   "guidance_scale", "cfg_rescale", "priority"]}
                                           -> image/jpeg (needs
                                              --img2img-strength > 0)

class_id requires --num-classes (class-conditional checkpoints); omitted
it samples unconditionally via the model's learned null embedding, so
conditional and unconditional requests share batches. /img2img requests
batch like any other variant — the client image rides as a per-request
payload row (SDEdit partial diffusion at the server's
--img2img-strength).

priority (per request; 0/"interactive"|"high", 1/"normal" default,
2/"low"|"background"|"batch") orders batch-slot assignment
interactive-first and sets the admission share under load: once the
queue passes a priority class's share of capacity, that class gets 503
while capacity stays reserved for more interactive traffic
(serving.SamplerServer admit_fractions, default 100%/100%/50%).

guidance_scale (per request; default --guidance-scale) buckets requests
by COST, not by value: scale == 1.0 routes to the single-UNet-eval
variant; any other scale routes to the CFG variant, where the scale
rides as a traced f32 row — so requests with DIFFERENT scales coalesce
into one batch and no scale ever triggers a recompile. Requires
--num-classes (CFG guides against the learned null class).

cfg_rescale (per request; default --cfg-rescale, guided requests only):
guidance rescale phi in [0, 1] (arXiv:2305.08891 §3.4) — like
guidance_scale it rides the CFG variant as a traced f32 row, so any mix
of phis (including none: phi 0 is exact plain CFG) coalesces into one
batch with one compiled program; an explicit cfg_rescale at
guidance_scale 1.0 is rejected (400) since it would have no effect.

negative_class (per request; query/body, guided requests only):
negative-class guidance — the CFG baseline is conditioned on this class
instead of the null class, steering the sample AWAY from it. Rides the
CFG variant as a traced int row (the null id is a per-sample no-op), so
requests with and without a negative prompt coalesce; a negative_class
at guidance_scale 1.0 is rejected (400) since it would have no effect.

steps (per request; default --timesteps) selects a sampler step tier —
a latency/quality knob (e.g. a 10-step preview vs the 20-step final).
Tiers are the COST buckets the server was launched with (--step-tiers);
a steps value outside them is 400, and img2img requests don't take one
(the SDEdit sub-schedule is fixed by --img2img-strength). Same-tier
requests batch together regardless of their other options' values.

Requests are deterministic per seed and independent of how they get
batched (each request contributes its own x_T via init_noise; eta=0).

Hardening (serving.py): `--size` takes several sizes (one server,
one set of weights, a jitted pipeline per size); a full queue sheds
load as HTTP 503; `--ttl-s` expires requests stuck in the queue
(HTTP 504).
"""
from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def build_parser() -> argparse.ArgumentParser:
    from ldm_image_generator_tpu.cli.common import add_device_arg, str2bool

    p = argparse.ArgumentParser(description="LDM sampling daemon")
    p.add_argument("-dp", "--ddpmpath", default="./ddpm.pt")
    p.add_argument("-decp", "--decpath", default="./vae_decoder.pt")
    add_device_arg(p)
    p.add_argument("-fp16", default=True, type=str2bool)
    p.add_argument("-s", "--size", nargs="+", default=[256], type=int,
                   help="image size(s) to serve; first is the default")
    p.add_argument("-t", "--timesteps", default=20, type=int)
    p.add_argument("--step-tiers", nargs="+", type=int, default=None,
                   help="additional per-request sampler step counts "
                        "served alongside --timesteps (e.g. '10' adds a "
                        "fast preview tier); requests select one with "
                        "steps=N. Cost bucketing: each tier is its own "
                        "compiled program per size (different step "
                        "counts cannot share a device batch), so warmup "
                        "compiles len(tiers) extra programs per "
                        "size/bucket")
    p.add_argument("--sampler", default="ddim", choices=["ddim", "dpm++2m"])
    p.add_argument("--cache-interval", default=1, type=int,
                   help="DeepCache deep-feature reuse for the NON-guided "
                        "sample variants (plain DDIM only; guided/img2img "
                        "buckets ignore it): recompute the UNet's deep "
                        "core every N sampler steps (1 = off; "
                        "approximation - gate with quality_gate.py)")
    p.add_argument("--port", default=8080, type=int)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--buckets", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--max-wait-ms", default=25.0, type=float)
    p.add_argument("--max-queue", default=1024, type=int,
                   help="pending-request bound; beyond it submit sheds "
                        "load (HTTP 503)")
    p.add_argument("--ttl-s", default=None, type=float,
                   help="drop requests queued longer than this (HTTP 504)")
    p.add_argument("--config", default="default",
                   choices=["default", "tiny"])
    p.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="int8: quantized FFN weights (serving throughput)")
    p.add_argument("--num-classes", default=0, type=int,
                   help="serve a class-conditional model: requests may "
                        "pass class_id (0..N-1); omitted = unconditional "
                        "(the learned null embedding)")
    p.add_argument("--guidance-scale", default=1.0, type=float,
                   help="default classifier-free guidance strength for "
                        "requests that don't pass guidance_scale "
                        "(1 = off; != 1 requires --num-classes)")
    p.add_argument("--cfg-rescale", default=0.0, type=float,
                   help="default guidance rescale phi (arXiv:2305.08891 "
                        "§3.4) for guided requests that don't pass "
                        "cfg_rescale themselves (phi rides as a traced "
                        "per-request row; any phi shares the batch)")
    p.add_argument("--img2img-strength", default=0.0, type=float,
                   help="also serve POST /img2img (SDEdit partial "
                        "diffusion from a client image) at this strength "
                        "(0 = endpoint disabled)")
    p.add_argument("-encp", "--encpath", default="./vae_encoder.pt",
                   help="VAE encoder weights (img2img serving only)")
    from ldm_image_generator_tpu.cli.common import add_diffusion_args

    add_diffusion_args(p)
    return p


def make_sampler(args):
    """({image_size: pipeline_sample(keys, batch)}, default_size) from
    CLI args. All sizes share one set of weights (UNet/decoder params
    are spatial-size independent); each size is its own jit variant."""
    import jax
    import jax.numpy as jnp

    from ldm_image_generator_tpu.cli.common import maybe_load
    from ldm_image_generator_tpu.config import (
        DDPMConfig, UNetConfig, VAEConfig,
    )
    from ldm_image_generator_tpu.pipelines import LDMPipeline
    from ldm_image_generator_tpu.utils import torch_import as ti

    import dataclasses

    ucfg, vcfg = UNetConfig(), VAEConfig()
    if args.config == "tiny":
        ucfg, vcfg = ucfg.tiny(), vcfg.tiny()
    ucfg = dataclasses.replace(ucfg, ffn_quant=args.quant,
                               num_classes=args.num_classes)
    dtype = jnp.bfloat16 if args.fp16 else jnp.float32
    dcfg = DDPMConfig(prediction=args.prediction,
                      zero_terminal_snr=args.zero_snr)
    pipe = LDMPipeline(ucfg, vcfg, dcfg, dtype=dtype)

    sizes = list(args.size) if isinstance(args.size, (list, tuple)) \
        else [args.size]
    key = jax.random.PRNGKey(0)
    latent0 = sizes[0] // vcfg.downscale
    z0 = jnp.zeros((1, latent0, latent0, ucfg.input_channels))
    t0 = jnp.zeros((1,), jnp.int32)
    unet_params = pipe.unet.init({"params": key, "moe": key}, z0, t0)
    dec_params = pipe.decoder.init(key, z0)
    unet_params = maybe_load(
        args.ddpmpath, unet_params, lambda sd: ti.convert_ddpm(sd, ucfg)
    ) or unet_params
    dec_params = maybe_load(
        args.decpath, dec_params, lambda sd: ti.convert_decoder(sd, vcfg)
    ) or dec_params

    enc_params = None
    if args.img2img_strength > 0:
        enc_params = pipe.encoder.init(
            key, jnp.zeros((1, sizes[0], sizes[0], 3)))
        enc_params = maybe_load(
            args.encpath, enc_params, lambda sd: ti.convert_encoder(sd, vcfg)
        ) or enc_params

    def make_for_size(size: int, num_steps: int = args.timesteps):
        latent = size // vcfg.downscale
        noise_shape = (latent, latent, ucfg.input_channels)

        def pipeline_sample(keys, batch, class_ids=None):
            # per-request determinism: each request's key seeds only its
            # own x_T; the shared scan key (routing/eta-noise) is fixed.
            # class_ids (conditional servers): int32 [batch]; the null id
            # == num_classes rides through CFG as a zero guidance delta,
            # so mixed conditional/unconditional batches are exact.
            noise = jax.vmap(
                lambda k: jax.random.normal(k, noise_shape, jnp.float32)
            )(keys)
            return pipe.sample(
                unet_params, dec_params, jax.random.PRNGKey(0),
                batch=batch, image_size=size, num_steps=num_steps,
                sampler=args.sampler, init_noise=noise,
                condition=class_ids,
                cache_interval=(args.cache_interval
                                if args.sampler == "ddim" else 1),
            )

        return pipeline_sample

    def make_cfg_for_size(size: int, num_steps: int = args.timesteps):
        latent = size // vcfg.downscale
        noise_shape = (latent, latent, ucfg.input_channels)

        def pipeline_cfg(keys, batch, class_ids, guidance_scales,
                         negative_ids, rescales):
            # the guided bucket: per-request scales ride as a traced f32
            # row (one compiled program for every scale; mixed-scale
            # requests share the batch). Costs two UNet evals per step,
            # which is why scale==1 requests route to pipeline_sample.
            # negative_ids: per-request negative-class guidance — the
            # null id is a per-sample no-op, so plain-CFG and
            # negative-prompt requests coalesce into the same batch.
            # rescales: per-request CFG-rescale phi, same coalescing
            # (phi 0 rows are exact plain CFG).
            noise = jax.vmap(
                lambda k: jax.random.normal(k, noise_shape, jnp.float32)
            )(keys)
            return pipe.sample(
                unet_params, dec_params, jax.random.PRNGKey(0),
                batch=batch, image_size=size, num_steps=num_steps,
                sampler=args.sampler, init_noise=noise,
                condition=class_ids, guidance_scales=guidance_scales,
                cfg_rescales=rescales,
                negative_condition=negative_ids,
            )

        return pipeline_cfg

    def make_img2img_for_size(size: int, cfg: bool):
        latent = size // vcfg.downscale
        noise_shape = (latent, latent, ucfg.input_channels)

        def pipeline_img2img(keys, batch, class_ids=None,
                             guidance_scales=None, negative_ids=None,
                             rescales=None, payload=None):
            # per-request determinism: each request's key seeds its OWN
            # forward-diffusion noise, so the result is independent of
            # batch composition (same contract as pipeline_sample)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, noise_shape, jnp.float32)
            )(keys)
            return pipe.img2img(
                unet_params, dec_params, enc_params, jax.random.PRNGKey(0),
                payload, strength=args.img2img_strength,
                num_steps=args.timesteps, sampler=args.sampler,
                condition=class_ids, fwd_noise=noise,
                guidance_scales=guidance_scales,
                cfg_rescales=rescales,
                negative_condition=negative_ids,
            )

        if cfg:
            return pipeline_img2img

        def pipeline_plain(keys, batch, class_ids=None, payload=None):
            return pipeline_img2img(keys, batch, class_ids,
                                    payload=payload)

        return pipeline_plain

    from ldm_image_generator_tpu.serving import Variant

    conditional = args.num_classes > 0
    variants = {s: make_for_size(s) for s in sizes}
    if conditional:
        for s in sizes:
            variants[("cfg", s)] = Variant(
                make_cfg_for_size(s), takes_guidance=True,
                takes_negative=True, takes_rescale=True,
            )
    # per-request step tiers (cost bucketing like guidance: a tier is a
    # different program COST, so each gets its own jitted variant; the
    # default --timesteps tier keeps the bare keys above)
    tiers = tuple(sorted(set(getattr(args, "step_tiers", None) or [])
                         - {args.timesteps}))
    for n in tiers:
        for s in sizes:
            variants[("steps", n, s)] = make_for_size(s, n)
            if conditional:
                variants[("steps", n, "cfg", s)] = Variant(
                    make_cfg_for_size(s, n), takes_guidance=True,
                    takes_negative=True, takes_rescale=True,
                )
    if args.img2img_strength > 0:
        for s in sizes:
            variants[("img2img", s)] = Variant(
                make_img2img_for_size(s, cfg=False), payload_shape=(s, s, 3)
            )
            if conditional:
                variants[("cfg", "img2img", s)] = Variant(
                    make_img2img_for_size(s, cfg=True),
                    payload_shape=(s, s, 3), takes_guidance=True,
                    takes_negative=True, takes_rescale=True,
                )
    return variants, sizes[0], tiers


def make_handler(server, jpeg_encode, default_size=None,
                 default_guidance=1.0, step_tiers=(),
                 default_steps=None, default_rescale=0.0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        @staticmethod
        def _route(size, guidance, img2img=False, steps=None,
                   negative=None, rescale=None):
            """(variant key, guidance-or-None, rescale-or-None):
            bucketing by COST — guidance scale 1.0 (after defaulting)
            rides the single-eval variant, anything else the CFG
            variant (scale is a traced per-request value); a
            non-default `steps` count routes to that tier's compiled
            variants (--step-tiers). ValueError for a steps value the
            server doesn't serve (mapped to 400 by the callers).
            negative (negative_class) rides the CFG variant as a traced
            per-request id — it needs a guided request to have any
            effect, so it is rejected at scale 1. rescale (cfg_rescale,
            per-request phi; None -> the server's --cfg-rescale) rides
            the CFG variant as a traced f32 row the same way, and is
            likewise rejected when passed explicitly at scale 1."""
            gs = default_guidance if guidance is None else guidance
            use_cfg = gs != 1.0
            if negative is not None and not use_cfg:
                raise ValueError(
                    "negative_class has no effect at guidance_scale 1.0 "
                    "— pass guidance_scale != 1"
                )
            if rescale is not None and not use_cfg:
                raise ValueError(
                    "cfg_rescale has no effect at guidance_scale 1.0 "
                    "— pass guidance_scale != 1"
                )
            phi = default_rescale if rescale is None else rescale
            size_eff = size if size is not None else default_size
            if steps is not None and steps == default_steps:
                steps = None  # the default tier keeps the bare keys
            if steps is not None and steps not in step_tiers:
                raise ValueError(
                    f"steps={steps} is not served; tiers: "
                    f"{sorted(set(step_tiers) | ({default_steps} if default_steps else set()))}"
                )
            if img2img:
                if steps is not None:
                    raise ValueError(
                        "steps tiers are not available for img2img "
                        "(the SDEdit sub-schedule is set by the "
                        "server's --img2img-strength)"
                    )
                variant = (("cfg", "img2img", size_eff) if use_cfg
                           else ("img2img", size_eff))
            elif steps is not None:
                variant = (("steps", steps, "cfg", size_eff) if use_cfg
                           else ("steps", steps, size_eff))
            else:
                variant = ("cfg", size_eff) if use_cfg else size
            # phi 0.0 is an exact no-op -> ride as None (keeps custom
            # CFG variants that predate takes_rescale working)
            return (variant, (gs if use_cfg else None),
                    (phi if use_cfg and phi != 0.0 else None))

        def _send_503(self, e):
            self.send_response(503)
            body = json.dumps({"error": str(e)}).encode()
            self.send_header("Content-Type", "application/json")
            self.send_header("Retry-After", "1")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _sample(self, seed: int, size=None, class_id=None,
                    payload=None, img2img=False, guidance=None,
                    priority=1, steps=None, negative=None,
                    rescale=None):
            # every failure mode maps to a specific HTTP status, never a
            # dropped connection: 503 shed, 504 ttl-expired, 400 bad
            # variant/class_id/payload/guidance/steps/rescale, 500
            # anything else
            from ldm_image_generator_tpu.serving import ServerOverloaded

            try:
                variant, gs, phi = self._route(size, guidance, img2img,
                                               steps, negative, rescale)
                fut = server.submit(seed, variant=variant,
                                    class_id=class_id, payload=payload,
                                    guidance=gs, negative_class=negative,
                                    cfg_rescale=phi, priority=priority)
            except ServerOverloaded as e:
                return self._send_503(e)
            except (KeyError, ValueError) as e:
                return self._send(
                    400, json.dumps({"error": str(e)}).encode()
                )
            try:
                img = fut.result(timeout=600)
            except TimeoutError as e:
                return self._send(
                    504, json.dumps({"error": f"expired: {e}"}).encode()
                )
            except Exception as e:
                return self._send(
                    500,
                    json.dumps({"error": f"sampling failed: {e}"}).encode(),
                )
            self._send(200, jpeg_encode(img), "image/jpeg")

        MAX_BATCH_SEEDS = 64

        def _sample_batch(self, items):
            """Streamed batch sampling: submit every request up front
            (so they coalesce into full device batches) and write each
            JPEG as a multipart/mixed part the moment its future
            resolves — the client renders images as they complete
            instead of waiting for the slowest. `items` is a list of
            per-request option dicts (seed/size/class_id/guidance/
            steps/negative/rescale/priority) — a HETEROGENEOUS batch:
            each item routes independently, and items that land on the
            same cost bucket still coalesce into one device batch
            (guidance/rescale/negative ride as traced rows). Parts
            carry X-Index (position in the request) and X-Seed; a
            failed item becomes an application/json part instead of
            killing the stream. Close-delimited body (HTTP/1.0
            semantics): no Content-Length, the terminating boundary
            ends the stream."""
            from concurrent.futures import as_completed

            from ldm_image_generator_tpu.serving import ServerOverloaded

            futs = {}
            try:
                for i, it in enumerate(items):
                    variant, gv, phi = self._route(
                        it.get("size"), it.get("guidance"),
                        steps=it.get("steps"),
                        negative=it.get("negative"),
                        rescale=it.get("rescale"))
                    futs[server.submit(
                        it["seed"], variant=variant,
                        class_id=it.get("class_id"), guidance=gv,
                        negative_class=it.get("negative"),
                        cfg_rescale=phi,
                        priority=it.get("priority", 1),
                    )] = (i, it["seed"])
            except ServerOverloaded as e:
                for f in futs:
                    f.cancel()
                return self._send_503(e)
            except (KeyError, ValueError) as e:
                for f in futs:
                    f.cancel()
                return self._send(
                    400, json.dumps({"error": str(e)}).encode()
                )
            boundary = "ldmframe"
            self.send_response(200)
            self.send_header("Content-Type",
                             f"multipart/mixed; boundary={boundary}")
            self.send_header("Connection", "close")
            self.end_headers()
            for fut in as_completed(list(futs), timeout=600):
                index, seed = futs[fut]
                try:
                    body = jpeg_encode(fut.result())
                    ctype = "image/jpeg"
                except Exception as e:
                    body = json.dumps({"index": index, "seed": seed,
                                       "error": str(e)}).encode()
                    ctype = "application/json"
                try:
                    self.wfile.write(
                        f"--{boundary}\r\nContent-Type: {ctype}\r\n"
                        f"X-Index: {index}\r\nX-Seed: {seed}\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n".encode())
                    self.wfile.write(body)
                    self.wfile.write(b"\r\n")
                    self.wfile.flush()
                except (BrokenPipeError, ConnectionError, OSError):
                    # client went away: free the undispatched slots
                    for f in futs:
                        f.cancel()
                    return
            self.wfile.write(f"--{boundary}--\r\n".encode())

        _PRIORITY_NAMES = {"interactive": 0, "high": 0, "normal": 1,
                           "low": 2, "background": 2, "batch": 2}

        @classmethod
        def _parse_priority(cls, raw):
            """0|1|2 or a name; None -> normal (1)."""
            if raw is None:
                return 1
            if isinstance(raw, str) and raw.strip().lower() in \
                    cls._PRIORITY_NAMES:
                return cls._PRIORITY_NAMES[raw.strip().lower()]
            return int(raw)

        @staticmethod
        def _parse_size(raw):
            """Optional-int parse (size, class_id): None passes through
            (server default / unconditional); raises ValueError."""
            return int(raw) if raw is not None else None

        @classmethod
        def _parse_item(cls, obj, defaults=None):
            """One request's options (JSON body object or already-
            parsed values) -> the _sample_batch item dict. Missing keys
            fall back to `defaults` (the request-level options), then
            to the server defaults. Raises ValueError/TypeError on
            malformed values (mapped to 400 by the callers)."""
            d = defaults or {}

            def pick(key):
                v = obj.get(key)
                return v if v is not None else d.get(key)

            raw_gs = pick("guidance_scale")
            raw_phi = pick("cfg_rescale")
            return {
                "seed": int(obj.get("seed", 0)),
                "size": cls._parse_size(pick("size")),
                "class_id": cls._parse_size(pick("class_id")),
                "guidance": float(raw_gs) if raw_gs is not None else None,
                "rescale": float(raw_phi) if raw_phi is not None else None,
                "negative": cls._parse_size(pick("negative_class")),
                "steps": cls._parse_size(pick("steps")),
                "priority": cls._parse_priority(pick("priority")),
            }

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                s = server.stats
                self._send(200, json.dumps({
                    "ok": True, "requests": s.requests,
                    "batches": s.batches, "images": s.images,
                    "mean_batch": round(s.mean_batch, 2),
                }).encode())
            elif url.path == "/stats":
                self._send(
                    200, json.dumps(server.stats.snapshot()).encode()
                )
            elif url.path == "/sample":
                q = parse_qs(url.query)
                try:
                    seed = int(q.get("seed", ["0"])[0])
                    size = self._parse_size(q.get("size", [None])[0])
                    cid = self._parse_size(q.get("class_id", [None])[0])
                    raw_gs = q.get("guidance_scale", [None])[0]
                    gs = float(raw_gs) if raw_gs is not None else None
                    raw_phi = q.get("cfg_rescale", [None])[0]
                    phi = float(raw_phi) if raw_phi is not None else None
                    neg = self._parse_size(
                        q.get("negative_class", [None])[0])
                    nst = self._parse_size(q.get("steps", [None])[0])
                    prio = self._parse_priority(
                        q.get("priority", [None])[0])
                except ValueError as e:
                    return self._send(
                        400, json.dumps({"error": f"bad arg: {e}"}).encode()
                    )
                self._sample(seed, size, cid, guidance=gs, priority=prio,
                             steps=nst, negative=neg, rescale=phi)
            elif url.path == "/sample_batch":
                q = parse_qs(url.query)
                try:
                    if "seeds" in q:
                        seeds = [int(s) for s in q["seeds"][0].split(",")
                                 if s.strip()]
                    else:
                        base = int(q.get("seed", ["0"])[0])
                        seeds = list(range(
                            base, base + int(q.get("n", ["1"])[0])))
                    if not 1 <= len(seeds) <= self.MAX_BATCH_SEEDS:
                        raise ValueError(
                            f"need 1..{self.MAX_BATCH_SEEDS} seeds, "
                            f"got {len(seeds)}")
                    size = self._parse_size(q.get("size", [None])[0])
                    cid = self._parse_size(q.get("class_id", [None])[0])
                    raw_gs = q.get("guidance_scale", [None])[0]
                    gs = float(raw_gs) if raw_gs is not None else None
                    raw_phi = q.get("cfg_rescale", [None])[0]
                    phi = float(raw_phi) if raw_phi is not None else None
                    neg = self._parse_size(
                        q.get("negative_class", [None])[0])
                    nst = self._parse_size(q.get("steps", [None])[0])
                    prio = self._parse_priority(
                        q.get("priority", [None])[0])
                except ValueError as e:
                    return self._send(
                        400, json.dumps({"error": f"bad arg: {e}"}).encode()
                    )
                item = {"size": size, "class_id": cid, "guidance": gs,
                        "steps": nst, "negative": neg, "rescale": phi,
                        "priority": prio}
                self._sample_batch([dict(item, seed=s) for s in seeds])
            elif url.path == "/metrics":
                self._send(200, server.prometheus().encode(),
                           "text/plain; version=0.0.4; charset=utf-8")
            else:
                self._send(404, b'{"error": "not found"}')

        # A single request must not be able to exhaust host memory on
        # this one-core box: cap the declared body size before reading
        # it (16MB covers any sane base64 image payload) and bound the
        # decoded image dimensions before the full pixel decode.
        MAX_BODY_BYTES = 16 * 1024 * 1024
        MAX_IMAGE_PIXELS = 64 * 1024 * 1024  # 8k x 8k

        def do_POST(self):
            url = urlparse(self.path)
            if url.path not in ("/sample", "/img2img", "/sample_batch"):
                return self._send(404, b'{"error": "not found"}')
            n = int(self.headers.get("Content-Length", 0))
            if n > self.MAX_BODY_BYTES:
                return self._send(413, json.dumps(
                    {"error": f"body too large ({n} bytes > "
                              f"{self.MAX_BODY_BYTES})"}).encode())
            if url.path == "/sample_batch":
                # heterogeneous streamed batch: {"items": [{...}, ...]}
                # with per-item seed/size/class_id/guidance_scale/
                # cfg_rescale/negative_class/steps/priority (top-level
                # keys are per-request defaults), or the homogeneous
                # {"seeds": [...], ...options} shorthand. Items that
                # route to the same cost bucket coalesce on-device.
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if "items" in body:
                        raw_items = body["items"]
                        if not isinstance(raw_items, list) or not all(
                                isinstance(o, dict) for o in raw_items):
                            raise ValueError(
                                "items must be a list of objects")
                    else:
                        raw_items = [{"seed": s} for s in body["seeds"]]
                    if not 1 <= len(raw_items) <= self.MAX_BATCH_SEEDS:
                        raise ValueError(
                            f"need 1..{self.MAX_BATCH_SEEDS} items, "
                            f"got {len(raw_items)}")
                    items = [self._parse_item(o, defaults=body)
                             for o in raw_items]
                except (KeyError, ValueError, TypeError) as e:
                    return self._send(400, json.dumps(
                        {"error": f"bad request: {e}"}).encode())
                return self._sample_batch(items)
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
                seed = int(body.get("seed", 0))
                size = self._parse_size(body.get("size"))
                cid = self._parse_size(body.get("class_id"))
                raw_gs = body.get("guidance_scale")
                gs = float(raw_gs) if raw_gs is not None else None
                raw_phi = body.get("cfg_rescale")
                phi = float(raw_phi) if raw_phi is not None else None
                neg = self._parse_size(body.get("negative_class"))
                nst = self._parse_size(body.get("steps"))
                prio = self._parse_priority(body.get("priority"))
                payload = None
                if url.path == "/img2img":
                    # {"image": base64 of any image format PIL reads}
                    import base64
                    import io

                    from ldm_image_generator_tpu.data.dataset import (
                        preprocess_image,
                    )

                    raw = base64.b64decode(body["image"])
                    # header-only open (PIL reads just metadata) to
                    # reject decompression bombs before the pixel decode;
                    # PIL raises its own DecompressionBombError above
                    # ~178M declared pixels — map that to 413 too
                    from PIL import Image as _Image

                    try:
                        with _Image.open(io.BytesIO(raw)) as im:
                            w, h = im.size
                    except _Image.DecompressionBombError:
                        return self._send(413, json.dumps(
                            {"error": "image too large"}).encode())
                    if w * h > self.MAX_IMAGE_PIXELS:
                        return self._send(413, json.dumps(
                            {"error": f"image too large ({w}x{h})"}
                        ).encode())
                    payload = preprocess_image(
                        io.BytesIO(raw),
                        size if size is not None else default_size,
                        use_native=False,  # takes a file object
                    )
            except (KeyError, ValueError, TypeError, AttributeError,
                    OSError) as e:
                return self._send(
                    400, json.dumps({"error": f"bad request: {e}"}).encode()
                )
            self._sample(seed, size, cid, payload,
                         img2img=url.path == "/img2img", guidance=gs,
                         priority=prio, steps=nst, negative=neg,
                         rescale=phi)

    return Handler


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ldm_image_generator_tpu.cli.common import setup_device

    setup_device(args.device, args)
    import numpy as np
    from PIL import Image

    from ldm_image_generator_tpu.serving import SamplerServer

    if not 0.0 <= args.img2img_strength <= 1.0:
        raise SystemExit("--img2img-strength must be in [0, 1]")
    if args.guidance_scale != 1.0 and not args.num_classes:
        raise SystemExit("--guidance-scale != 1 requires --num-classes "
                         "(CFG guides against the learned null class)")
    if args.step_tiers and any(t < 1 for t in args.step_tiers):
        raise SystemExit("--step-tiers must be >= 1")
    pipelines, default_size, step_tiers = make_sampler(args)
    server = SamplerServer(pipelines, batch_buckets=args.buckets,
                           max_wait_ms=args.max_wait_ms,
                           max_queue=args.max_queue,
                           default_ttl_s=args.ttl_s,
                           num_classes=args.num_classes or None)
    print(f"warmup: compiling sizes {list(pipelines)} x buckets "
          f"{args.buckets}", flush=True)
    server.warmup()
    server.start()

    def jpeg_encode(img) -> bytes:
        buf = io.BytesIO()
        Image.fromarray(np.asarray(img)).save(buf, format="JPEG",
                                              quality=95)
        return buf.getvalue()

    httpd = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(server, jpeg_encode, default_size,
                     default_guidance=args.guidance_scale,
                     step_tiers=step_tiers,
                     default_steps=args.timesteps,
                     default_rescale=args.cfg_rescale),
    )
    print(f"serving on http://{args.host}:{args.port}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
