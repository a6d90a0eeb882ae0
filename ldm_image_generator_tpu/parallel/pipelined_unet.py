"""Pipeline-parallel UNet forward: the deep SwinStacks run through the
GPipe schedule (parallel/pipeline.py) over a ('stage', 'data') mesh.

The reference has no distributed support (SURVEY.md §2); this wires the
standalone pipeline subsystem into the real model so `train_ldm
--pipeline-stages S` can train with the UNet's depth sharded across
devices. Which blocks pipeline:

  * Every SwinStack block without attention is *homogeneous*: identical
    param structure AND identical math (`shift` only affects the window
    attention branch, models/layers.py SwinBlock — encoder stacks never
    window at all). The default config's bottleneck encoder stack is 9
    such blocks of C=1024 — the depth-dominant compute
    (reference unet.py:75 stages=[3,3,9,3]).
  * A stack pipelines when its homogeneous prefix (all blocks for
    encoder stacks, num_blocks-2 for decoder stacks) divides evenly
    into S pipeline stages; otherwise it runs sequentially (GSPMD
    data-parallel only). Attention tail blocks always run sequentially
    — they are two blocks at most and structurally different.

This module intentionally re-implements UNet.__call__'s skeleton
(models/unet.py:94-181) as a pure function over the SAME param tree —
byte-identical numerics are enforced by tests/test_pipeline_parallel.py
(pipelined-vs-plain exact equality), so the two cannot drift silently.

Stream design: (x, t) ride the pipeline together — FiLM conditioning is
per-sample, so each microbatch carries its own timesteps. Per-block RNG
keys travel inside the stacked stage params (leading 'stage' axis), so
each device draws only its own stages' routing/stochastic-depth bits.
"""
from __future__ import annotations

import zlib
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from ldm_image_generator_tpu.config import UNetConfig
from ldm_image_generator_tpu.models.layers import SwinBlock
from ldm_image_generator_tpu.models.unet import (
    avg_pool_2x,
    upsample_nearest_2x,
)
from ldm_image_generator_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_stage_params,
)


def _hash(name: str) -> int:
    return zlib.crc32(name.encode()) & 0x7FFFFFFF


def _make_block(cfg: UNetConfig, c: int, shift: int, attention: bool,
                dtype) -> SwinBlock:
    """SwinBlock configured exactly as UNet.make_stack does
    (models/unet.py:106-124)."""
    return SwinBlock(
        c,
        head_dim=cfg.head_dim,
        window_size=cfg.window_size,
        shift=shift,
        attention=attention,
        stochastic_depth=cfg.stochastic_depth,
        num_experts=cfg.num_experts,
        experts_per_call=cfg.experts_per_call,
        ffn_mul=cfg.ffn_mul,
        ffn_quant=cfg.ffn_quant,
        cond_channels=cfg.cond_channels if cfg.num_classes else 0,
        fixed_expert_indices=cfg.fixed_expert_indices,
        ablate_branches=cfg.ablate_branches,
        attention_backend=cfg.attention_backend,
        ffn_backend=cfg.ffn_backend,
        dtype=dtype,
    )


def _block_rngs(rngs: Optional[dict], stage_name: str, bidx: int) -> dict:
    """Stable per-block rng keys (flax derives per-path keys in the
    plain forward; here the derivation is explicit so keys can be
    stacked along the 'stage' axis and sharded with the params)."""
    if not rngs:
        return {}
    h = _hash(f"{stage_name}/block_{bidx}")
    return {
        name: jax.random.fold_in(jax.random.fold_in(k, h), bidx)
        for name, k in rngs.items()
    }


def pipelined_unet_apply(
    cfg: UNetConfig,
    params: Any,
    x: jnp.ndarray,
    t: jnp.ndarray,
    mesh: Mesh,
    cond: Optional[jnp.ndarray] = None,
    rngs: Optional[dict] = None,
    deterministic: bool = True,
    dtype=jnp.bfloat16,
    num_microbatches: Optional[int] = None,
    axis: str = "stage",
    data_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """UNet forward (same params/numerics as UNet.apply,
    models/unet.py:94-181) with deep homogeneous stacks pipelined over
    mesh axis `axis`."""
    p = params["params"]
    s = mesh.shape[axis]
    chs = list(cfg.channels)
    stages = list(cfg.stages)
    n = len(chs)
    stem = cfg.stem_size
    x = x.astype(dtype)

    # class conditioning (models/unet.py:78-92)
    if cfg.num_classes > 0 and cond is not None and jnp.issubdtype(
        cond.dtype, jnp.integer
    ):
        embed = nn.Embed(
            cfg.num_classes + 1, cfg.cond_channels * cfg.cond_tokens,
            dtype=dtype,
        )
        cond = embed.apply(
            {"params": p["class_embed"]}, cond.astype(jnp.int32)
        ).reshape(cond.shape[0], cfg.cond_tokens, cfg.cond_channels)

    x = nn.Conv(
        chs[0], (stem, stem), strides=(stem, stem), padding="VALID",
        dtype=dtype,
    ).apply({"params": p["encoder_first"]}, x)

    def run_blocks_seq(sp, name, c, idxs, attention, x):
        for k in idxs:
            shift = cfg.window_size // 2 if k % 2 == 0 else 0
            attn = attention and k >= len(idxs_all[name]) - 2
            block = _make_block(cfg, c, shift, attn, dtype)
            x = block.apply(
                {"params": sp[f"block_{k}"]}, x, t,
                cond if attn else None, deterministic,
                rngs=_block_rngs(rngs, name, k),
            )
        return x

    idxs_all = {}

    def run_stack(name, i, attention, x):
        """One stage's SwinStack (models/layers.py:744-800 semantics):
        homogeneous prefix pipelined when it divides into S stages."""
        sp = p[name]
        nb = stages[i]
        c = chs[i]
        idxs_all[name] = list(range(nb))
        prefix = nb - 2 if attention else nb
        prefix = max(prefix, 0)
        if s > 1 and prefix >= s and prefix % s == 0:
            per_stage = prefix // s
            stage_trees = []
            for j in range(s):
                blocks, keys = {}, {}
                for k in range(per_stage):
                    b = j * per_stage + k
                    blocks[f"b{k}"] = sp[f"block_{b}"]
                    keys[f"b{k}"] = _block_rngs(rngs, name, b)
                stage_trees.append({"blocks": blocks, "keys": keys})
            stacked = stack_stage_params(stage_trees)
            block = _make_block(cfg, c, 0, False, dtype)

            def block_fn(ps, stream):
                xx, tt = stream
                for k in range(per_stage):
                    xx = block.apply(
                        {"params": ps["blocks"][f"b{k}"]}, xx, tt,
                        None, deterministic, rngs=ps["keys"][f"b{k}"],
                    )
                return (xx, tt)

            if cfg.remat:
                block_fn = jax.checkpoint(block_fn)
            x, _ = pipeline_apply(
                block_fn, stacked, (x, t), mesh,
                num_microbatches=num_microbatches, axis=axis,
                data_axis=data_axis,
            )
        else:
            x = run_blocks_seq(sp, name, c, list(range(prefix)),
                               attention, x)
        # attention tail (the last two blocks of decoder stacks)
        x = run_blocks_seq(sp, name, c, list(range(prefix, nb)),
                           attention, x)
        return x

    skips = []
    for i in range(n):
        with jax.named_scope(f"enc_stage_{i}"):
            x = run_stack(f"enc_stage_{i}", i, False, x)
        if i == n - 1:
            skips.append(None)  # zero bottleneck skip (unet.py:95)
        else:
            skips.append(x)
            with jax.named_scope(f"down_{i}"):
                x = nn.Dense(chs[i + 1], dtype=dtype).apply(
                    {"params": p[f"enc_chconv_{i}"]}, x
                )
                x = avg_pool_2x(x)

    for i in reversed(range(n)):
        if i != n - 1:
            with jax.named_scope(f"up_{i}"):
                x = upsample_nearest_2x(x)
                x = nn.Dense(chs[i], dtype=dtype).apply(
                    {"params": p[f"dec_chconv_{i}"]}, x
                )
        sk = skips[i]
        if sk is not None:
            x = x + sk
        with jax.named_scope(f"dec_stage_{i}"):
            x = run_stack(f"dec_stage_{i}", i, True, x)

    x = nn.ConvTranspose(
        cfg.input_channels, (stem, stem), strides=(stem, stem),
        padding="VALID", dtype=dtype,
    ).apply({"params": p["decoder_last"]}, x)
    return x
