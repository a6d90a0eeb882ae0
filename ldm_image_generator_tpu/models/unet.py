"""Denoiser UNet (reference unet.py:74-103), NHWC / flax.

4-stage symmetric UNet over latent maps. Encoder stages run without
attention, decoder stages with attention on the last two blocks of each
stack; additive skip connections with a zero bottleneck skip
(unet.py:92-101). Downsampling between encoder stages is 1x1 conv then
2x2 average pool; decoder upsampling is nearest 2x then 1x1 conv
(unet.py:80-85). The stem / un-stem are stride-`stem_size` (transposed)
convs — 1x1 Dense at the default stem_size=1 (unet.py:76-78).

Unlike the reference, `condition` actually reaches the decoder stages'
cross-attention (the reference drops it, unet.py:93,101, and its
CrossAttention returns None anyway).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ldm_image_generator_tpu.config import UNetConfig
from ldm_image_generator_tpu.models.layers import SwinStack


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(kernel=2, stride=2) in NHWC."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2) default nearest mode (unet.py:85)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class UNet(nn.Module):
    cfg: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        film=None,
        collect_film: bool = False,
        deep=None,
        with_deep: bool = False,
    ) -> jnp.ndarray:
        """Denoise `x` at timestep(s) `time`.

        FiLM schedule cache (sampling optimization — the FiLM towers are
        ~184M of the 385.7M default params and depend only on (t, H, W)):
        `collect_film=True` runs only the stem/resize path plus every
        block's FiLM tower for a [S]-batch of timesteps and returns a
        nested {stage: {block: (mul, bias)}} pytree of [S, h, w, c]
        tensors; `film=<that pytree sliced to one step>` replays it,
        so a DDIM scan streams the FiLM weights zero times instead of
        once per step. Numerics identical to the inline path.

        Deep-feature cache (DeepCache-style sampling optimization —
        "Cache Me if You Can" arXiv:2312.03209 / "Faster Diffusion"
        arXiv:2312.09608 applied to this UNet): the network's "deep
        core" (everything between `down_0` and the output of
        `dec_chconv_0`, i.e. stages 1..n-1 of both the encoder and
        decoder) changes slowly across adjacent sampler timesteps, while
        the outermost stage tracks x_t. `with_deep=True` additionally
        returns that deep-core output; `deep=<a previous step's deep
        output>` skips the deep core entirely and reuses it — only
        enc_stage_0 + the skip add + dec_stage_0 + unstem run. The
        sampler refreshes the cache every `cache_interval` steps
        (diffusion/ddpm.py ddim_sample deep_cache). Requires >= 2
        stages."""
        cfg = self.cfg
        chs = list(cfg.channels)
        stages = list(cfg.stages)
        n = len(chs)
        stem = cfg.stem_size
        x = x.astype(self.dtype)

        # Class conditioning (product surface for the path the reference
        # stubs out, ddpm.py:78): integer class ids [B] are embedded via
        # a learned table into cond_tokens tokens of cond_channels dims;
        # row num_classes is the learned "null" embedding (the CFG
        # unconditional branch). Pre-built token tensors [B, T, D] pass
        # through unchanged.
        if cfg.num_classes > 0:
            embed = nn.Embed(
                cfg.num_classes + 1,
                cfg.cond_channels * cfg.cond_tokens,
                dtype=self.dtype,
                name="class_embed",
            )
            if condition is not None and jnp.issubdtype(
                condition.dtype, jnp.integer
            ):
                condition = embed(condition.astype(jnp.int32)).reshape(
                    condition.shape[0], cfg.cond_tokens, cfg.cond_channels
                )
            else:
                _ = embed(jnp.zeros((1,), jnp.int32))  # param creation

        x = nn.Conv(
            chs[0], (stem, stem), strides=(stem, stem), padding="VALID",
            dtype=self.dtype, name="encoder_first",
        )(x)

        # MoE routing plan: ONE vectorized randint for every block's
        # 2-of-E expert-pair draw per apply, instead of a per-block
        # scalar fold_in+threefry (36 tiny scalar kernels per step on
        # the default config — the measured ~0.35 ms/step
        # "routing/scalar handling" of docs/PERF.md). The distribution
        # is unchanged (iid uniform over the same unordered-pair table,
        # matching the reference's random.sample 2-of-E, modules.py:35);
        # slots are keyed by stage NAME so the DeepCache fast path (which
        # runs only enc/dec_stage_0) draws the same routing for those
        # stages as the full path under the same key.
        moe_plan = None
        plan_offsets = {}
        if (
            not collect_film
            and cfg.fixed_expert_indices is None
            and cfg.experts_per_call == 2
            and self.has_rng("moe")
            # LDM_MOE_PLAN=0: per-block make_rng draws (the pre-plan
            # path) — kept for paired in-process A/B measurement
            and os.environ.get("LDM_MOE_PLAN", "1") != "0"
        ):
            off = 0
            for i in range(n):
                plan_offsets[f"enc_stage_{i}"] = off
                off += stages[i]
            for i in reversed(range(n)):
                plan_offsets[f"dec_stage_{i}"] = off
                off += stages[i]
            n_pairs = cfg.num_experts * (cfg.num_experts - 1) // 2
            moe_plan = jax.random.randint(
                self.make_rng("moe"), (off,), 0, n_pairs
            )

        # cfg.remat: rematerialize each stage in backward (jax.checkpoint)
        # — trades recompute FLOPs for activation memory so large batches
        # fit HBM (args x=0, t=1, cond=2 are arrays; deterministic is the
        # static python bool at arg index 4, counting self)
        stack_cls = (
            nn.remat(SwinStack, static_argnums=(4,)) if cfg.remat else SwinStack
        )
        make_stack = lambda cls, i, attn, name: cls(
            chs[i],
            num_blocks=stages[i],
            head_dim=cfg.head_dim,
            window_size=cfg.window_size,
            attention=attn,
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
            dtype=self.dtype,
            name=name,
        )

        def run_stack(i, attn, name, x):
            """One stage: remat'd normal call, plain pass-through film
            collection, or film replay (sliced pytree per stage)."""
            cond = condition if attn else None
            if collect_film:
                # no remat: this path is FiLM-towers-only and cheap
                return make_stack(SwinStack, i, attn, name)(
                    x, time, cond, deterministic, None, True
                )
            f = None if film is None else film[name]
            mp = None
            if moe_plan is not None:
                o = plan_offsets[name]
                mp = moe_plan[o:o + stages[i]]
            return make_stack(stack_cls, i, attn, name)(
                x, time, cond, deterministic, f, moe_plan=mp
            )

        films = {}
        deep_out = None
        if deep is not None:
            # deep-cache fast path: outermost stage only; the cached
            # deep-core output stands in for stages 1..n-1
            assert not collect_film and n >= 2
            with jax.named_scope("enc_stage_0"):
                x = run_stack(0, False, "enc_stage_0", x)
            deep_out = deep.astype(self.dtype)
            x = deep_out + x
            with jax.named_scope("dec_stage_0"):
                x = run_stack(0, True, "dec_stage_0", x)
        else:
            # jax.named_scope: per-stage attribution in jax.profiler
            # traces (docs/PERF.md; scopes show up as TraceMe names)
            skips = []
            for i in range(n):
                with jax.named_scope(f"enc_stage_{i}"):
                    x = run_stack(i, False, f"enc_stage_{i}", x)
                    if collect_film:
                        x, films[f"enc_stage_{i}"] = x
                if i == n - 1:
                    skips.append(None)  # zero bottleneck skip (unet.py:95)
                else:
                    skips.append(x)
                    with jax.named_scope(f"down_{i}"):
                        x = nn.Dense(
                            chs[i + 1], dtype=self.dtype,
                            name=f"enc_chconv_{i}"
                        )(x)
                        x = avg_pool_2x(x)

            for i in reversed(range(n)):
                if i != n - 1:
                    with jax.named_scope(f"up_{i}"):
                        x = upsample_nearest_2x(x)
                        x = nn.Dense(
                            chs[i], dtype=self.dtype, name=f"dec_chconv_{i}"
                        )(x)
                if i == 0 and n >= 2:
                    deep_out = x  # the cacheable deep-core output
                s = skips[i]
                if s is not None:
                    x = x + s
                with jax.named_scope(f"dec_stage_{i}"):
                    x = run_stack(i, True, f"dec_stage_{i}", x)
                    if collect_film:
                        x, films[f"dec_stage_{i}"] = x

        if collect_film:
            return films

        x = nn.ConvTranspose(
            cfg.input_channels, (stem, stem), strides=(stem, stem), padding="VALID",
            dtype=self.dtype, name="decoder_last",
        )(x)
        if with_deep:
            return x, deep_out
        return x
