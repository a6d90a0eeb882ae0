"""Ground-truth accuracy check for the Pallas window-attention backward.

Same methodology as ffn_bwd_truth_check.py: both backward candidates
are bf16 pipelines with different rounding points, so they can only be
judged against an fp64 ground truth:

  truth   = torch float64 autograd of the exact window-MHA math
            (window_mha_xla semantics: fp32-softmax, key-padding bias)
  pallas  = grads through fused_window_mha with the Pallas backward
            kernel (LDM_ATTN_BWD=pallas)
  xla     = grads through fused_window_mha with the XLA recompute VJP
            (the production alternative)

Verdict per gradient: pallas accepted iff
    fro(pallas - truth) <= TOL_RATIO * fro(xla - truth).

Shapes are the default 385.7M UNet's attention stages at b64 latent-32
(windowed 36-token stages at C=128/256/512 with their in-model fold,
and the 16-token full-map stage at C=1024, fold 8).

Run (TPU): python benchmarks/attn_bwd_truth_check.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL_RATIO = 1.3

ARG_NAMES = ("x", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")


def torch_truth(np_args, h, mask_np, g_np):
    """fp64 autograd gradients of sum(window_mha(x) * g) (torch CPU)."""
    import numpy as np
    import torch

    leaves = [torch.tensor(a, dtype=torch.float64, requires_grad=True)
              for a in np_args]
    x, wq, bq, wk, bk, wv, bv, wo, bo = leaves
    n, l, c = x.shape
    d = c // h
    q = (x @ wq + bq).reshape(n, l, h, d)
    k = (x @ wk + bk).reshape(n, l, h, d)
    v = (x @ wv + bv).reshape(n, l, h, d)
    scores = torch.einsum("nlhd,nshd->nhls", q, k) / float(d) ** 0.5
    if mask_np is not None:
        m = torch.tensor(mask_np)
        scores = scores + torch.where(
            m[:, None, None, :], torch.tensor(-1e9, dtype=torch.float64),
            torch.tensor(0.0, dtype=torch.float64))
    probs = torch.softmax(scores, dim=-1)
    out = torch.einsum("nhls,nshd->nlhd", probs, v).reshape(n, l, c)
    y = out @ wo + bo
    (y * torch.tensor(np.asarray(g_np, np.float64))).sum().backward()
    return [t.grad.numpy() for t in leaves]


def check(n, l, c, h, fold, masked, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ldm_image_generator_tpu.kernels.window_attention as wa

    ks = jax.random.split(jax.random.PRNGKey(seed), 11)
    bf = jnp.bfloat16
    x = (jax.random.normal(ks[0], (n, l, c)) * 0.5).astype(bf)
    g = (jax.random.normal(ks[10], (n, l, c)) * 0.5).astype(bf)
    w = lambda i: (jax.random.normal(ks[i], (c, c)) * 0.05).astype(bf)
    b = lambda i: (jax.random.normal(ks[i + 4], (c,)) * 0.01).astype(bf)
    args = (w(1), b(1), w(2), b(2), w(3), b(3), w(4), b(4))
    mask = None
    if masked:
        # edge-window padding pattern: last 6 key tokens masked on a
        # third of the windows (the real pad mask shape at 32->36px)
        mask = jnp.zeros((n, l), bool).at[:: 3, l - 6:].set(True)

    def grads():
        # a FRESH jit per arm: the backward choice is a trace-time env
        # switch, so the program must be re-traced after flipping it
        f = jax.jit(lambda x_, g_, *ws: jax.vjp(
            lambda xx, *w2: wa.fused_window_mha(
                xx, mask, *w2, num_heads=h, fold=fold),
            x_, *ws)[1](g_))
        return jax.device_get(f(x, g, *args))

    from ldm_image_generator_tpu.kernels.dispatch import clear_probe_cache

    os.environ["LDM_ATTN_BWD"] = "pallas"
    clear_probe_cache()
    gp = grads()
    os.environ["LDM_ATTN_BWD"] = "xla"
    clear_probe_cache()
    gx = grads()
    os.environ.pop("LDM_ATTN_BWD", None)

    np_args = [np.asarray(a, np.float32).astype(np.float64)
               for a in (x,) + args]
    gt = torch_truth(np_args, h,
                     None if mask is None else np.asarray(mask),
                     np.asarray(g, np.float32))

    ok = True
    for name, p, xg, t in zip(ARG_NAMES, gp, gx, gt):
        p = np.asarray(p, np.float64)
        xg = np.asarray(xg, np.float64)
        tn = max(float(np.linalg.norm(t)), 1e-12)
        ep = float(np.linalg.norm(p - t)) / tn
        ex = float(np.linalg.norm(xg - t)) / tn
        good = ep <= TOL_RATIO * ex + 1e-9
        ok &= good
        print(f"  {name:3s} pallas_vs_truth {ep:.3e}  xla_vs_truth "
              f"{ex:.3e}  ratio {ep / max(ex, 1e-300):5.2f}  "
              f"{'ok' if good else 'FAIL'}", flush=True)
    return ok


def main():
    ok = True
    # (windows, tokens, channels, heads, in-model fold, masked):
    # b64 latent-32 attention stages of the default UNet
    for shape in ((2304, 36, 128, 4, 2, True),
                  (576, 36, 256, 8, 2, True),
                  (256, 36, 512, 16, 2, True),
                  (64, 16, 1024, 32, 8, False)):
        print(f"shape N={shape[0]} L={shape[1]} C={shape[2]} "
              f"H={shape[3]} fold={shape[4]} masked={shape[5]}",
              flush=True)
        ok &= check(*shape)
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
