"""Component ablation timing for the UNet denoise step.

Times chained denoise steps with individual SwinBlock branches disabled
to attribute step time (profiler traces don't cross this environment's
TPU tunnel, so attribution is by ablation). Prints JSON lines.

Run: python benchmarks/ablate.py [batch] [latent]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import UNetConfig
from ldm_image_generator_tpu.utils.profiling import chained_time


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    latent = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import flax.linen as nn

    from ldm_image_generator_tpu.models import layers as L
    from ldm_image_generator_tpu.models.unet import UNet

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, latent, latent, 8), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    rngs = {"moe": jax.random.PRNGKey(2)}

    # monkeypatchable branch switches
    orig_block_call = L.SwinBlock.__call__

    cfg = UNetConfig()
    unet0 = UNet(cfg, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k: unet0.init({"params": k, "moe": k}, x, t)
    )(key)  # ablated variants keep identical param trees — init once

    def timed(name):
        unet = UNet(cfg, dtype=jnp.bfloat16)

        def step(x, params):
            return unet.apply(params, x, t, deterministic=True,
                              rngs=rngs).astype(jnp.float32)

        sec = chained_time(step, x, params, chain_len=30, iters=3)
        print(json.dumps({"variant": name, "batch": batch, "latent": latent,
                          "value": round(sec * 1000, 4), "unit": "ms/step"}),
              flush=True)
        return sec

    full = timed("full")

    def make_ablated(disable):
        def call(self, x, t, cond=None, deterministic=True):
            c = self.channels
            heads = max(1, c // self.head_dim)
            res = x
            h = L.channel_norm(x) if "norm" not in disable else x
            if "film" not in disable:
                h = L.Encodings(c, dtype=self.dtype, name="encodings")(h, t)
            else:
                _ = L.Encodings(c, dtype=self.dtype, name="encodings")(
                    h[:, :1, :1, :], t)
            branch = jnp.zeros_like(h)
            if "moe" not in disable:
                branch = branch + L.RandomMoE(
                    c, fixed_expert_indices=self.fixed_expert_indices,
                    dtype=self.dtype, name="ffn")(h)
            else:
                _ = L.RandomMoE(c, dtype=self.dtype, name="ffn")(h[:, :1, :1, :])
            if "conv" not in disable:
                branch = branch + nn.Conv(
                    c, (3, 3), padding="SAME", feature_group_count=heads,
                    dtype=self.dtype, name="conv")(h)
            else:
                _ = nn.Conv(c, (3, 3), padding="SAME",
                            feature_group_count=heads, dtype=self.dtype,
                            name="conv")(h[:, :3, :3, :])
            if self.attention and "attn" not in disable:
                branch = branch + L.WindowAttention(
                    c, heads, window_size=self.window_size, shift=self.shift,
                    dtype=self.dtype, name="self_attention")(h)
                cross = L.CrossAttention(c, heads, dtype=self.dtype,
                                         name="cross_attention")
                _ = cross(branch[:, :1, :1, :],
                          jnp.zeros((branch.shape[0], 1, c), dtype=branch.dtype))
            elif self.attention:
                _ = L.WindowAttention(
                    c, heads, window_size=self.window_size, shift=self.shift,
                    dtype=self.dtype, name="self_attention")(h[:, :6, :6, :])
                cross = L.CrossAttention(c, heads, dtype=self.dtype,
                                         name="cross_attention")
                _ = cross(branch[:, :1, :1, :],
                          jnp.zeros((branch.shape[0], 1, c), dtype=branch.dtype))
            return res + branch

        return call

    for disable in [("attn",), ("moe",), ("conv",), ("film",), ("norm",)]:
        L.SwinBlock.__call__ = nn.compact(make_ablated(set(disable)))
        try:
            timed(f"no_{'_'.join(disable)}")
        finally:
            L.SwinBlock.__call__ = orig_block_call


if __name__ == "__main__":
    main()
