"""C=1024 attention-backward construction sweep (round-5, VERDICT item 8).

The default UNet's deepest stage (64 full-map windows of 16 tokens at
C=1024, 32 heads) stays on the XLA recompute VJP: the Pallas backward
with the forward's fold=8 crashes the remote Mosaic compiler
(kernels/window_attention.py:_attn_bwd_usable). Fold is only a compute
strategy — gradients are identical for any fold — so this script sweeps
Mosaic-safe constructions: fold in {1, 2, 4} x tile_windows in {4, 8}.

For each combo it
  1. AOT-compiles window_mha_bwd_pallas at (64, 16, 1024);
  2. if it compiles, checks every gradient against the torch fp64 truth
     (same methodology/tolerance as attn_bwd_truth_check.py: accepted
     iff fro-distance <= 1.3x the XLA VJP's) and times a 20-call chain
     vs the XLA VJP backward.

Outcome feeds the dispatch default: a combo that compiles, is accurate,
and beats XLA gets wired in via the backward fold override; if none
compile, the C=1024 XLA floor is confirmed as measured.

Run (TPU): python benchmarks/attn_bwd_c1024.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from attn_bwd_truth_check import ARG_NAMES, TOL_RATIO, torch_truth  # noqa: E402

N, L, C, H = 64, 16, 1024, 32


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    import ldm_image_generator_tpu.kernels.window_attention as wa
    from ldm_image_generator_tpu.utils.profiling import fence

    ks = jax.random.split(jax.random.PRNGKey(0), 11)
    bf = jnp.bfloat16
    x = (jax.random.normal(ks[0], (N, L, C)) * 0.5).astype(bf)
    g = (jax.random.normal(ks[10], (N, L, C)) * 0.5).astype(bf)
    w = lambda i: (jax.random.normal(ks[i], (C, C)) * 0.05).astype(bf)
    b = lambda i: (jax.random.normal(ks[i + 4], (C,)) * 0.01).astype(bf)
    args = (w(1), b(1), w(2), b(2), w(3), b(3), w(4), b(4))
    mask = None  # the 16-token full-map stage has no padding

    # fp64 truth + XLA-VJP reference grads (the production alternative)
    np_args = [np.asarray(a, np.float32).astype(np.float64)
               for a in (x,) + args]
    gt = torch_truth(np_args, H, None, np.asarray(g, np.float32))
    xla_vjp = jax.jit(lambda x_, g_, *ws: jax.vjp(
        lambda xx, *w2: wa.window_mha_xla(xx, mask, *w2, num_heads=H),
        x_, *ws)[1](g_))
    gx = [np.asarray(a, np.float64) for a in
          jax.device_get(xla_vjp(x, g, *args))]

    def timing(fn, iters=3, chain=20):
        # dependent chain: feed dx back as the next x (shape-preserving)
        @jax.jit
        def run(x0):
            def body(c, _):
                outs = fn(c)
                return outs[0].astype(c.dtype), outs[1][0, 0]
            return jax.lax.scan(body, x0, jnp.arange(chain))

        st, out = run(x)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, out = run(x)
            fence(out)
        return (time.perf_counter() - t0) / (iters * chain)

    # XLA backward chain baseline
    def xla_bwd(xx):
        grads = jax.vjp(
            lambda q, *w2: wa.window_mha_xla(q, mask, *w2, num_heads=H),
            xx, *args)[1](g)
        return grads[0], grads[1]

    t_xla = timing(xla_bwd)
    print(json.dumps({"arm": "xla_vjp", "s_per_call": round(t_xla, 6)}),
          flush=True)

    results = []
    for fold in (1, 2, 4):
        for tn in (4, 8):
            tag = f"fold{fold}_tn{tn}"
            rec = {"arm": tag, "fold": fold, "tn": tn}
            try:
                t0 = time.perf_counter()
                lowered = wa.window_mha_bwd_pallas.lower(
                    jax.ShapeDtypeStruct(x.shape, x.dtype), None,
                    jax.ShapeDtypeStruct(g.shape, g.dtype),
                    *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args],
                    num_heads=H, tile_windows=tn, fold=fold,
                ).compile()
                rec["compile_s"] = round(time.perf_counter() - t0, 1)
            except Exception as e:
                rec["compile_error"] = str(e)[:160]
                print(json.dumps(rec), flush=True)
                results.append(rec)
                continue
            del lowered

            outs = jax.device_get(wa.window_mha_bwd_pallas(
                x, mask, g, *args, num_heads=H, tile_windows=tn,
                fold=fold))
            dx, dwqkv, dbqkv, dwo, dbo = outs
            # split fused grads back to per-projection, in ARG_NAMES
            # order: x, wq, bq, wk, bk, wv, bv, wo, bo
            gp = [np.asarray(dx, np.float64),
                  np.asarray(dwqkv[:, 0:C], np.float64),
                  np.asarray(dbqkv[0:C], np.float64),
                  np.asarray(dwqkv[:, C:2 * C], np.float64),
                  np.asarray(dbqkv[C:2 * C], np.float64),
                  np.asarray(dwqkv[:, 2 * C:3 * C], np.float64),
                  np.asarray(dbqkv[2 * C:3 * C], np.float64),
                  np.asarray(dwo, np.float64),
                  np.asarray(dbo, np.float64)]
            ok = True
            worst = 0.0
            for name, p, xg, t in zip(ARG_NAMES, gp, gx, gt):
                tnorm = max(float(np.linalg.norm(t)), 1e-12)
                ep = float(np.linalg.norm(p - t)) / tnorm
                ex = float(np.linalg.norm(xg - t)) / tnorm
                ratio = ep / max(ex, 1e-300)
                worst = max(worst, ratio)
                ok &= ep <= TOL_RATIO * ex + 1e-9

            def pallas_bwd(xx):
                outs = wa.window_mha_bwd_pallas(
                    xx, mask, g, *args, num_heads=H, tile_windows=tn,
                    fold=fold)
                return outs[0], outs[1]

            t_p = timing(pallas_bwd)
            rec.update({"accurate": bool(ok), "worst_ratio": round(worst, 3),
                        "s_per_call": round(t_p, 6),
                        "vs_xla": round(t_p / t_xla, 3)})
            print(json.dumps(rec), flush=True)
            results.append(rec)

    viable = [r for r in results
              if r.get("accurate") and r.get("vs_xla", 9) < 1.0]
    print(json.dumps({
        "verdict": (f"viable: {min(viable, key=lambda r: r['vs_xla'])}"
                    if viable else
                    "no Mosaic-safe construction beats the XLA VJP at "
                    "C=1024 — the XLA floor stands (documented in "
                    "docs/PERF.md)")
    }), flush=True)


if __name__ == "__main__":
    main()
