"""Parameterized building blocks (flax.linen), NHWC, mixed precision.

These re-implement the *behavior* of the reference ops layer
(attention.py, modules.py, unet.py:9-66) as TPU-idiomatic modules:

  * 1x1 convs become Dense over the lane (channel) axis — a clean MXU matmul.
  * Window attention is static reshapes + one batched MHA; the shifted-window
    mask bug (attention.py:40, rolled activations used as mask) is fixed by
    rolling the boolean mask.
  * CrossAttention returns its output (the reference forgets the return,
    attention.py:92-99, making conditioning dead; here it works).
  * RandomMoE routing (2-of-4 uniform, modules.py:35) and stochastic depth
    (p=0.25 per block per step, unet.py:39-40) are traced `jax.random`
    draws with static shapes: routing gathers 2 expert weight slices from a
    stacked [E, ...] tensor (so only 2 experts' FLOPs are spent), and
    stochastic depth multiplies the residual branch by a 0/1 gate (the block
    is residual, so gating the branch is exactly the reference's skip).

RNG streams used under `.apply`:
  'moe'  — expert routing (always required: the reference samples experts at
           inference too, modules.py:35).
  'sd'   — stochastic depth (only read when deterministic=False).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ldm_image_generator_tpu.ops.norm import channel_norm
from ldm_image_generator_tpu.ops.sinusoidal import (
    positional_encoding_2d,
    time_encoding_2d,
)
from ldm_image_generator_tpu.ops.window import (
    merge_windows,
    pad_mask,
    pad_to_window_multiple,
    partition_windows,
    shift_2d,
)

Dtype = jnp.dtype

NEG_INF = -1e9  # additive mask value; applied to fp32 scores


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections (all biased),
    matching torch nn.MultiheadAttention semantics (attention.py:8).

    Scores are computed in fp32 (softmax stability in bf16 runs).
    key_padding_mask: [B, S] bool, True = masked key.
    """

    channels: int
    num_heads: int
    # 'auto': fused Pallas self-attention with head folding on every
    # self-attention stage. Round 2 gated this per shape from STANDALONE
    # kernel A/Bs (8/16-head stages stayed on XLA); round 3's IN-MODEL
    # measurement (benchmarks/attn_inmodel.py, full 385.7M UNet denoise
    # at b64, t-batch 64) showed the standalone numbers don't transfer:
    # pallas-everywhere 18.54 ms vs mixed 18.68 vs XLA-everywhere
    # 22.39. The head-folded joint matmul (fold=4 at 36-token windows,
    # fold=8 at short sequences; kernels/window_attention.py) is what
    # closed the 8/16-head gap the round-2 per-head loop lost.
    # 'pallas'/'xla' force the backend.
    backend: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, key_padding_mask=None):
        c, h = self.channels, self.num_heads
        d = c // h
        # kv projections are sized by the key/value source so
        # cross-attention can consume condition tokens of any width
        # (one cond tensor feeds stages of different channel counts)
        ckv = kv_in.shape[-1]
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        wq = self.param("wq", init, (c, c))
        bq = self.param("bq", zeros, (c,))
        wk = self.param("wk", init, (ckv, c))
        bk = self.param("bk", zeros, (c,))
        wv = self.param("wv", init, (ckv, c))
        bv = self.param("bv", zeros, (c,))
        wo = self.param("wo", init, (c, c))
        bo = self.param("bo", zeros, (c,))
        dt = self.dtype
        weights = tuple(
            w.astype(dt) for w in (wq, bq, wk, bk, wv, bv, wo, bo)
        )

        use_fused = self.backend in ("pallas", "auto")
        if (
            use_fused
            and q_in is kv_in
            and c % 128 == 0
            # the fused kernel's VMEM sizing was measured on 2-byte
            # compute dtypes; fp32 (-fp16 false) runs the XLA path
            and jnp.dtype(dt).itemsize == 2
            and jax.default_backend() in ("tpu", "axon")
        ):
            from ldm_image_generator_tpu.kernels.dispatch import pallas_usable
            from ldm_image_generator_tpu.kernels.window_attention import (
                fused_window_mha,
                window_mha_pallas,
            )

            x_in = q_in.astype(dt)
            # head-fold factor, measured IN-MODEL at b64/t64 (full
            # default UNet denoise, benchmarks/attn_inmodel.py sweep over
            # LDM_ATTN_FOLD_WIN x LDM_ATTN_FOLD_SHORT with the round-3
            # single-QKV-matmul kernel): 36-token windows fold=2 17.03 ms
            # vs fold=1 17.87 / fold=4 17.24 / fold=8 18.52 — the joint
            # matmul's f^2 FLOP inflation overtakes its MXU-utilization
            # gain above f=2; short (<=16-token) full-map sequences keep
            # fold=8 (fs=4 19.15, fs=16 17.63). Env vars override for
            # tuning sweeps.
            import os

            f_short = int(os.environ.get("LDM_ATTN_FOLD_SHORT", "0")) or 8
            f_win = int(os.environ.get("LDM_ATTN_FOLD_WIN", "0")) or 2
            fold = (
                min(f_short, h) if x_in.shape[1] <= 16 else min(f_win, h)
            )
            sig = (x_in.shape, jnp.dtype(x_in.dtype).name,
                   key_padding_mask is not None, h, fold)
            thunk = lambda: window_mha_pallas.lower(
                jax.ShapeDtypeStruct(x_in.shape, x_in.dtype),
                None if key_padding_mask is None else jax.ShapeDtypeStruct(
                    key_padding_mask.shape, key_padding_mask.dtype),
                *[jax.ShapeDtypeStruct(w.shape, w.dtype) for w in weights],
                num_heads=h, fold=fold,
            ).compile()
            if pallas_usable("window_attention", sig, thunk):
                return fused_window_mha(
                    x_in, key_padding_mask, *weights, num_heads=h, fold=fold
                )

        if q_in is kv_in:
            # pack qkv into one MXU matmul (the concat is loop-invariant
            # and hoisted out of sampling scans)
            wqkv = jnp.concatenate([weights[0], weights[2], weights[4]], axis=1)
            bqkv = jnp.concatenate([weights[1], weights[3], weights[5]])
            q, k, v = jnp.split(q_in.astype(dt) @ wqkv + bqkv, 3, axis=-1)
        else:
            q = q_in.astype(dt) @ weights[0] + weights[1]
            wkv = jnp.concatenate([weights[2], weights[4]], axis=1)
            bkv = jnp.concatenate([weights[3], weights[5]])
            k, v = jnp.split(kv_in.astype(dt) @ wkv + bkv, 2, axis=-1)
        b, l, _ = q.shape
        s = k.shape[1]
        q = q.reshape(b, l, h, d)
        k = k.reshape(b, s, h, d)
        v = v.reshape(b, s, h, d)
        scores = jnp.einsum(
            "blhd,bshd->bhls", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / jnp.sqrt(d).astype(jnp.float32))
        if key_padding_mask is not None:
            scores = scores + jnp.where(
                key_padding_mask[:, None, None, :], NEG_INF, 0.0
            )
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        out = jnp.einsum("bhls,bshd->blhd", probs, v)
        out = out.reshape(b, l, c)
        return out @ weights[6] + weights[7]


class WindowAttention(nn.Module):
    """Swin-style windowed self-attention over NHWC maps.

    Behavior matches attention.py:5-85 with the mask bug fixed: bypass
    windowing entirely when H,W <= window_size (attention.py:15-16);
    otherwise pad to window multiples, optionally cyclic-shift by `shift`,
    window-partition, run MHA with the (correctly shifted) pad mask,
    merge, unshift, crop.
    """

    channels: int
    num_heads: int
    window_size: int = 6
    shift: int = 0
    backend: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        mha = MultiHeadAttention(
            self.channels, self.num_heads, backend=self.backend,
            dtype=self.dtype, name="mha"
        )
        if h <= ws and w <= ws:
            tokens = x.reshape(b, h * w, c)
            return mha(tokens, tokens).reshape(b, h, w, c)

        xp, _, _ = pad_to_window_multiple(x, ws)
        hp, wp = xp.shape[1], xp.shape[2]
        mask2d = pad_mask(h, w, hp, wp)  # [Hp, Wp] True = padding
        if self.shift != 0:
            xp = shift_2d(xp, self.shift)
            mask2d = jnp.roll(mask2d, (self.shift, self.shift), axis=(0, 1))

        wins = partition_windows(xp, ws)  # [B*nwin, ws*ws, C]
        mwin = partition_windows(mask2d[None, :, :, None], ws)  # [nwin, ws*ws, 1]
        nwin = mwin.shape[0]
        key_mask = jnp.tile(mwin[:, :, 0], (b, 1))  # windows are batch-major

        out = mha(wins, wins, key_padding_mask=key_mask)
        out = merge_windows(out, b, hp, wp, ws)
        if self.shift != 0:
            out = shift_2d(out, -self.shift)
        return out[:, :h, :w, :]


class CrossAttention(nn.Module):
    """Cross-attention of a flattened map against condition tokens.

    The reference's version computes this and then returns None
    (attention.py:87-99); here it returns the attended map, making the
    conditioning path functional.
    """

    channels: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        out = MultiHeadAttention(
            self.channels, self.num_heads, dtype=self.dtype, name="mha"
        )(tokens, cond)
        return out.reshape(b, h, w, c)


class ReGLU(nn.Module):
    """Gated FFN c(a(x) * relu(b(x))) of 1x1 convs (modules.py:7-15),
    expressed as Dense layers over the channel axis."""

    channels: int
    ffn_mul: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.channels * self.ffn_mul
        a = nn.Dense(hidden, dtype=self.dtype, name="a")(x)
        b = nn.Dense(hidden, dtype=self.dtype, name="b")(x)
        return nn.Dense(self.channels, dtype=self.dtype, name="c")(a * jax.nn.relu(b))


class RandomMoE(nn.Module):
    """general(x) + e_i(x) + e_j(x) with (i, j) a uniform 2-of-E draw per
    call (modules.py:28-36 — note the reference samples at inference too).

    Experts are stored stacked [E, ...]; the routing draw gathers exactly
    `experts_per_call` weight slices, so compute scales with the number of
    *active* experts, and the expert axis is ready to shard (EP) later.
    """

    channels: int
    ffn_mul: int = 1
    num_experts: int = 4
    experts_per_call: int = 2
    fixed_expert_indices: Optional[Sequence[int]] = None  # tests/parity only
    # 'int8': per-output-channel int8 FFN weights on the fused kernel
    # paths — half the HBM weight streaming during sampling scans;
    # dequantized in-kernel (kernels/ffn_block.quantize_cols). Inference
    # optimization; gradients remain w.r.t. full-precision weights.
    quant: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        expert_indices: Optional[jnp.ndarray] = None,
        film_mul: Optional[jnp.ndarray] = None,
        film_bias: Optional[jnp.ndarray] = None,
        conv_kernel: Optional[jnp.ndarray] = None,
        conv_bias: Optional[jnp.ndarray] = None,
        add_residual: bool = False,
        pair_id: Optional[jnp.ndarray] = None,
    ):
        """Standard call: x is the (already normalized + FiLMed) input,
        returns general(x) + e_i(x) + e_j(x).

        pair_id: optional scalar int32 in [0, E-choose-2) selecting the
        unordered expert pair from the canonical `pairs` table — the
        routing-plan fast path (UNet draws ONE vectorized randint for all
        blocks per apply instead of a per-block scalar fold_in+threefry
        inside the sampling scan; docs/PERF.md routing/scalar handling).
        Only meaningful at experts_per_call == 2; the distribution is
        identical to the make_rng draw (uniform over the same table).

        Fused call (film_mul/film_bias given): x is the RAW block input;
        channel_norm + FiLM + the three ReGLUs run as one Pallas kernel
        on TPU (kernels/ffn_block.py); returns (ffn_out, h) where h is
        the normalized+FiLMed activation for the sibling branches.

        Megakernel call (additionally conv_kernel/conv_bias given): the
        sibling grouped 3x3 conv branch and (optionally) the residual
        fold into the same kernel (kernels/block_core.py); returns
        ([x +] ffn + conv, h).
        """
        if expert_indices is None and self.fixed_expert_indices is not None:
            expert_indices = jnp.asarray(self.fixed_expert_indices)
        c = self.channels
        hid = c * self.ffn_mul
        e = self.num_experts
        init = nn.initializers.lecun_normal(batch_axis=(0,))
        init2 = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        wa = self.param("wa", init, (e, c, hid))
        wb = self.param("wb", init, (e, c, hid))
        wc = self.param("wc", init, (e, hid, c))
        ba = self.param("ba", zeros, (e, hid))
        bb = self.param("bb", zeros, (e, hid))
        bc = self.param("bc", zeros, (e, c))
        # the 'general' ReGLU owns its params directly so the fused kernel
        # can consume them (modules.py:31 general expert)
        gwa = self.param("gwa", init2, (c, hid))
        gwb = self.param("gwb", init2, (c, hid))
        gwc = self.param("gwc", init2, (hid, c))
        gba = self.param("gba", zeros, (hid,))
        gbb = self.param("gbb", zeros, (hid,))
        gbc = self.param("gbc", zeros, (c,))

        dt = self.dtype
        pairs = [(i, j) for i in range(e) for j in range(i + 1, e)]

        if pair_id is not None and self.experts_per_call != 2:
            pair_id = None  # pair table only covers the 2-of-E routing

        if film_mul is not None:
            # fused path (norm + FiLM + FFN [+ conv + residual])
            if expert_indices is None:
                if pair_id is None:
                    rng = self.make_rng("moe")
                    pair_id = jax.random.randint(rng, (), 0, len(pairs))
                pair_table = jnp.asarray(pairs, dtype=jnp.int32)
                expert_indices = pair_table[pair_id]
            ids = jnp.asarray(expert_indices, dtype=jnp.int32)
            cast = lambda w: w.astype(dt)
            ffn_w = (
                cast(gwa), cast(gba), cast(gwb), cast(gbb), cast(gwc),
                cast(gbc), cast(wa), cast(ba), cast(wb), cast(bb),
                cast(wc), cast(bc),
            )
            if conv_kernel is not None:
                from ldm_image_generator_tpu.kernels.block_core import (
                    block_core,
                )

                return block_core(
                    x.astype(dt), film_mul.astype(dt), film_bias.astype(dt),
                    *ffn_w, conv_kernel.astype(dt), conv_bias.astype(dt),
                    ids, add_residual=add_residual,
                    quantized=self.quant == "int8",
                )
            from ldm_image_generator_tpu.kernels.ffn_block import ffn_block

            flat = lambda v: jnp.broadcast_to(v, x.shape).reshape(-1, c)
            out, h = ffn_block(
                x.reshape(-1, c).astype(dt), flat(film_mul.astype(dt)),
                flat(film_bias.astype(dt)), *ffn_w, ids,
                quantized=self.quant == "int8",
            )
            return out.reshape(x.shape), h.reshape(x.shape)

        if self.quant == "int8":
            # simulated quantization on the non-fused path so the flag
            # is never a silent no-op (CPU runs get the same numerics
            # the TPU int8 kernels produce)
            from ldm_image_generator_tpu.kernels.ffn_block import (
                fake_quantize,
            )

            gwa, gba = fake_quantize(gwa, gba)
            gwb, gbb = fake_quantize(gwb, gbb)
            gwc, gbc = fake_quantize(gwc, gbc)
            wa, ba = fake_quantize(wa, ba)
            wb, bb = fake_quantize(wb, bb)
            wc, bc = fake_quantize(wc, bc)

        def general(v):
            ga = v @ gwa.astype(dt) + gba.astype(dt)
            gb = v @ gwb.astype(dt) + gbb.astype(dt)
            return (ga * jax.nn.relu(gb)) @ gwc.astype(dt) + gbc.astype(dt)

        def expert(v, ei):
            # static expert index: reads exactly that expert's weight
            # slices from the stacked tensors, no dynamic-gather copies
            ha = v @ wa[ei].astype(dt) + ba[ei].astype(dt)
            hb = v @ wb[ei].astype(dt) + bb[ei].astype(dt)
            return (ha * jax.nn.relu(hb)) @ wc[ei].astype(dt) + bc[ei].astype(dt)

        if expert_indices is None and self.experts_per_call != 2:
            # non-default fan-in: sample without replacement, gather path
            expert_indices = jax.random.choice(
                self.make_rng("moe"), e, (self.experts_per_call,),
                replace=False,
            )
        if expert_indices is not None:
            # explicit routing (parity tests): dynamic gather of the
            # requested slices
            idx = jnp.asarray(expert_indices)
            xa = jnp.einsum("bhwc,kcm->kbhwm", x, wa[idx].astype(dt)) + ba[
                idx
            ].astype(dt).reshape(-1, 1, 1, 1, hid)
            xb = jnp.einsum("bhwc,kcm->kbhwm", x, wb[idx].astype(dt)) + bb[
                idx
            ].astype(dt).reshape(-1, 1, 1, 1, hid)
            hexp = xa * jax.nn.relu(xb)
            out = jnp.einsum(
                "kbhwm,kmc->bhwc", hexp, wc[idx].astype(dt)
            ) + jnp.sum(bc[idx].astype(dt), axis=0)
        else:
            # uniform unordered pair (matches random.sample 2-of-E,
            # modules.py:35) as a lax.switch over the E-choose-2 static
            # pairs: only the selected experts' weights are read, and —
            # unlike a dynamic gather — no weight copies are materialized
            # per call (a gather cost ~190MB of HBM traffic per denoise
            # step on the default UNet)
            if pair_id is None:
                rng = self.make_rng("moe")
                pair_id = jax.random.randint(rng, (), 0, len(pairs))
            out = jax.lax.switch(
                pair_id,
                [
                    (lambda i=i, j=j: lambda v: expert(v, i) + expert(v, j))()
                    for i, j in pairs
                ],
                x,
            )
        return general(x) + out


class _FiLMProj1(nn.Module):
    """First FiLM MLP layer with the concat-matmul factored:

        W1 @ concat(pos, time) == W1[:C] @ pos + W1[C:] @ time

    The pos half is batch-invariant ([1, H, W, C] -> computed once) and
    the time half is pixel-invariant ([bt, 1, 1, C] -> one row per
    timestep), so the layer costs H*W*C*4C + bt*C*4C FLOPs instead of
    bt*H*W*2C*4C — at training time-batch (bt = image batch) this halves
    the whole FiLM tower's FLOPs (layer 2 now dominates). Param tree and
    init are identical to the nn.Dense it replaces ('proj1'/kernel+bias,
    [2C, 4C]), so existing checkpoints load unchanged; numerics differ
    from the single concat matmul only by fp summation order."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pos, tim):
        c = pos.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2 * c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        pos_part = pos.astype(self.dtype) @ k[:c]      # [1, H, W, 4C]
        tim_part = tim.astype(self.dtype) @ k[c:]      # [bt, 1, 1, 4C]
        return pos_part + tim_part + bias.astype(self.dtype)


class Encodings(nn.Module):
    """FiLM conditioning from concatenated positional+time encodings
    (unet.py:9-23): concat [pe | te] -> 1x1 MLP (2C -> 4C -> 2C, ReLU) ->
    chunk into (mul, bias) -> x * mul + bias. The first layer runs in
    factored form (_FiLMProj1) — same math, half the tower FLOPs at
    per-sample time batches."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, return_film: bool = False):
        b, h, w, c = x.shape
        # The FiLM MLP input depends only on (h, w) and t — not on x — so
        # it is evaluated at the *time* batch size bt = t.shape[0] and
        # broadcast onto x. Samplers pass t of shape [1] (one shared
        # timestep per DDIM step), making the MLP cost independent of the
        # image batch; training passes per-sample t ([B]).
        bt = t.shape[0]
        pe = positional_encoding_2d(h, w, c, dtype=self.dtype)  # [H,W,C]
        te = time_encoding_2d(t, c, dtype=self.dtype)  # [bt,1,1,C]
        embs = _FiLMProj1(c * 4, dtype=self.dtype, name="proj1")(
            pe[None], te
        )
        embs = jnp.broadcast_to(embs, (bt, h, w, c * 4))
        embs = nn.Dense(c * 2, dtype=self.dtype, name="proj2")(jax.nn.relu(embs))
        mul, bias = jnp.split(embs, 2, axis=-1)
        if return_film:
            return mul, bias  # [bt, h, w, c] each, for the fused FFN path
        return x * mul + bias


class GroupedConv2d(nn.Module):
    """3x3 grouped conv with MXU-friendly lowering.

    The reference uses groups = C/head_dim = C/32 (unet.py:30). 32-wide
    groups run the 128x128 MXU at ~1/4 lane occupancy — measured ~5%
    utilization via ablation. When the channel count allows, the kernel
    is repacked at apply time into block-diagonal 128-wide groups:
    mathematically identical, 4x the nominal FLOPs, ~an order of
    magnitude better MXU utilization (measured ~3x faster end-to-end).

    Param layout matches nn.Conv(feature_group_count=C/group_width):
    kernel [kh, kw, group_width, C], bias [C] — checkpoints and torch
    imports are unaffected.
    """

    channels: int
    group_width: int = 32
    kernel_size: int = 3
    packed_width: int = 128
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.channels
        gw = min(self.group_width, c)
        kh = kw = self.kernel_size
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1, 2), out_axis=3),
            (kh, kw, gw, c),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (c,))

    def raw(self):
        """(kernel [kh,kw,gw,C], bias [C]) in the compute dtype — consumed
        by the block_core megakernel, which does its own repacking."""
        return self.kernel.astype(self.dtype), self.bias.astype(self.dtype)

    def __call__(self, x):
        c = self.channels
        gw = min(self.group_width, c)
        kh = kw = self.kernel_size
        kernel = self.kernel.astype(self.dtype)
        bias = self.bias
        x = x.astype(self.dtype)

        pw = self.packed_width
        m = pw // gw  # original groups packed per big group
        if c % pw == 0 and gw < pw:
            gb = c // pw
            # W'[kh,kw,(p,ci),(b,q,co)] = eye[p,q] * W[kh,kw,ci,(b,q,co)]
            eye = jnp.eye(m, dtype=self.dtype)
            wr = kernel.reshape(kh, kw, gw, gb, m, gw)
            wbig = jnp.einsum("hwibqo,pq->hwpibqo", wr, eye)
            wbig = wbig.reshape(kh, kw, pw, c)
            groups = gb
            kernel = wbig
        else:
            groups = c // gw

        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=self.dtype,
        )
        return out + bias.astype(self.dtype)


class SwinBlock(nn.Module):
    """Residual block: ChannelNorm -> FiLM -> (MoE-FFN + grouped 3x3 conv
    [+ window attention][+ cross attention]) -> +residual (unet.py:25-48).

    Stochastic depth (p, drawn once per call, shared across the batch like
    the reference's Python random.random(), unet.py:39) is applied as a 0/1
    gate on the residual branch — mathematically identical to skipping the
    block, but traced with static shapes.
    """

    channels: int
    head_dim: int = 32
    window_size: int = 6
    shift: int = 0
    attention: bool = True
    stochastic_depth: float = 0.25
    num_experts: int = 4
    experts_per_call: int = 2
    ffn_mul: int = 1
    ffn_quant: str = "none"  # 'int8' = quantized FFN weights (see RandomMoE)
    # width of cross-attention condition tokens (class-embedding path);
    # 0 = unconditioned model, dummy cross-attn params stay square (c, c)
    # so round-2 checkpoints load unchanged
    cond_channels: int = 0
    fixed_expert_indices: Optional[Sequence[int]] = None
    # debug/profiling: branch names ('norm','film','moe','conv','attn') to
    # skip at apply time; params are still created so checkpoints and
    # param trees stay identical (used by benchmarks/ablate.py)
    ablate_branches: Optional[Sequence[str]] = None
    # 'auto': fused Pallas window attention on the stages where it
    # measures faster (<= 4 heads, see MultiHeadAttention.backend);
    # 'pallas'/'xla' force one backend everywhere.
    attention_backend: str = "auto"
    # 'auto'/'pallas': fuse channel_norm + FiLM + MoE FFN into one Pallas
    # kernel (kernels/ffn_block.py) on TPU when shapes allow — measured
    # -18% full-model denoise step time; 'xla' composes in XLA.
    ffn_backend: str = "auto"
    dtype: Dtype = jnp.float32

    def _on(self, name: str) -> bool:
        return self.ablate_branches is None or name not in self.ablate_branches

    @nn.compact
    def __call__(self, x, t, cond=None, deterministic: bool = True,
                 film=None, collect_film: bool = False, moe_pair_id=None):
        c = self.channels
        # guard for tiny test configs where channels < head_dim (the
        # reference would divide by zero here, unet.py:30)
        heads = max(1, c // self.head_dim)
        res = x
        enc = Encodings(c, dtype=self.dtype, name="encodings")
        # FiLM schedule cache (sampling-only optimization): the FiLM MLP
        # output depends on (t, H, W) but NOT on x, and its weights are
        # ~half the UNet's parameters. `collect_film=True` evaluates just
        # the FiLM tower for a [S]-batch of timesteps and returns it with
        # x untouched; `film=(mul, bias)` replays a precomputed slice so
        # the DDIM scan never streams the FiLM weights. Numerics are
        # identical to the inline path (same module, same dtype).
        if collect_film:
            mul, bias = enc(x, t, return_film=True)
            return x, (mul, bias)
        moe = RandomMoE(
            c,
            ffn_mul=self.ffn_mul,
            num_experts=self.num_experts,
            experts_per_call=self.experts_per_call,
            fixed_expert_indices=self.fixed_expert_indices,
            quant=self.ffn_quant,
            dtype=self.dtype,
            name="ffn",
        )
        fuse_ffn = (
            self.ffn_backend in ("pallas", "auto")
            and self._on("norm") and self._on("film") and self._on("moe")
            and jax.default_backend() in ("tpu", "axon")
            # the fused kernel is specialized to 2 active experts at
            # hidden width == C; other routings use the XLA switch path
            and self.experts_per_call == 2
            and self.ffn_mul == 1
            # large stages (C=1024) stream weights in hidden-dim chunks
            # inside the kernel, so there is no VMEM cap here
            and c % 128 == 0
        )
        conv = GroupedConv2d(
            c,
            group_width=min(self.head_dim, c),
            dtype=self.dtype,
            name="conv",
        )
        # megakernel (kernels/block_core.py): also folds the conv branch
        # and — when no stochastic-depth gate / cross-attention will apply
        # to the branch — the residual, leaving at most window attention
        # outside the kernel. Engaged only in its measured winning regime
        # (small batches; see block_core_supported).
        from ldm_image_generator_tpu.kernels.block_core import (
            block_core_supported,
        )

        film_batch = film[0].shape[0] if film is not None else t.shape[0]
        fuse_conv = (
            fuse_ffn
            and self._on("conv")
            and block_core_supported(
                x.shape, c * self.ffn_mul, min(self.head_dim, c),
                film_batch, dtype=self.dtype,
            )
        )
        fold_res = (
            (deterministic or self.stochastic_depth == 0.0) and cond is None
        )
        conv_done = res_folded = False
        if fuse_ffn:
            mul, bias = (
                film if film is not None else enc(x, t, return_film=True)
            )
            if fuse_conv:
                with jax.named_scope("block_core"):
                    ck, cb = conv.raw()
                    branch, h = moe(
                        x, film_mul=mul, film_bias=bias,
                        conv_kernel=ck, conv_bias=cb,
                        add_residual=fold_res, pair_id=moe_pair_id,
                    )
                conv_done, res_folded = True, fold_res
            else:
                with jax.named_scope("ffn_fused"):
                    branch, h = moe(x, film_mul=mul, film_bias=bias,
                                    pair_id=moe_pair_id)
        else:
            with jax.named_scope("norm_film"):
                h = channel_norm(x) if self._on("norm") else x
                if not self._on("film"):
                    _ = enc(h[:, :1, :1, :], t)  # param creation only
                elif film is not None:
                    mul, bias = film
                    h = h * mul.astype(h.dtype) + bias.astype(h.dtype)
                else:
                    h = enc(h, t)
            if self._on("moe"):
                with jax.named_scope("moe_ffn"):
                    branch = moe(h, pair_id=moe_pair_id)
            else:
                _ = moe(h[:, :1, :1, :], pair_id=moe_pair_id)
                branch = jnp.zeros_like(h)
        if not conv_done:
            if self._on("conv"):
                with jax.named_scope("grouped_conv"):
                    branch = branch + conv(h)
            else:
                # touch params only — a dummy conv *call* is not free
                # (measured: it made the no_conv ablation slower than
                # the full model)
                _ = conv.raw()
        if self.attention:
            wattn = WindowAttention(
                c,
                heads,
                window_size=self.window_size,
                shift=self.shift,
                backend=self.attention_backend,
                dtype=self.dtype,
                name="self_attention",
            )
            if self._on("attn"):
                with jax.named_scope("window_attention"):
                    branch = branch + wattn(h)
            else:
                _ = wattn(h[:, : self.window_size, : self.window_size, :])
            cross = CrossAttention(c, heads, dtype=self.dtype, name="cross_attention")
            if cond is not None:
                # reference applies cross-attn to the summed branch (unet.py:45-46)
                with jax.named_scope("cross_attention"):
                    branch = branch + cross(branch, cond)
            else:
                # Create the cross-attention params even when unconditioned so
                # checkpoints are complete (the reference instantiates the
                # module regardless, unet.py:33-35). The dummy call's output
                # is unused -> XLA dead-code-eliminates the compute.
                ckv = self.cond_channels or c
                _ = cross(
                    branch[:, :1, :1, :],
                    jnp.zeros((branch.shape[0], 1, ckv), dtype=branch.dtype),
                )

        if not deterministic and self.stochastic_depth > 0.0:
            # res_folded is never true here (fold_res excludes this case)
            keep = (
                jax.random.uniform(self.make_rng("sd"), ()) > self.stochastic_depth
            )
            branch = branch * keep.astype(branch.dtype)
        return branch if res_folded else res + branch


class SwinStack(nn.Module):
    """Stack of SwinBlocks with alternating window shift (shift=ws//2 on
    even-indexed blocks) and attention enabled only on the last two blocks
    (unet.py:50-66)."""

    channels: int
    num_blocks: int = 2
    head_dim: int = 32
    window_size: int = 6
    attention: bool = True
    stochastic_depth: float = 0.25
    num_experts: int = 4
    experts_per_call: int = 2
    ffn_mul: int = 1
    ffn_quant: str = "none"
    cond_channels: int = 0
    fixed_expert_indices: Optional[Sequence[int]] = None
    ablate_branches: Optional[Sequence[str]] = None
    attention_backend: str = "auto"
    ffn_backend: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, cond=None, deterministic: bool = True,
                 film=None, collect_film: bool = False, moe_plan=None):
        films = {}
        for i in range(self.num_blocks):
            shift = self.window_size // 2 if i % 2 == 0 else 0
            attn = self.attention and i >= self.num_blocks - 2
            block = SwinBlock(
                self.channels,
                head_dim=self.head_dim,
                window_size=self.window_size,
                shift=shift,
                attention=attn,
                stochastic_depth=self.stochastic_depth,
                num_experts=self.num_experts,
                experts_per_call=self.experts_per_call,
                ffn_mul=self.ffn_mul,
                ffn_quant=self.ffn_quant,
                cond_channels=self.cond_channels,
                fixed_expert_indices=self.fixed_expert_indices,
                ablate_branches=self.ablate_branches,
                attention_backend=self.attention_backend,
                ffn_backend=self.ffn_backend,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            if collect_film:
                x, mb = block(x, t, cond, deterministic, None, True)
                films[f"block_{i}"] = mb
            else:
                bf = None if film is None else film[f"block_{i}"]
                mp = None if moe_plan is None else moe_plan[i]
                x = block(x, t, cond, deterministic, bf,
                          moe_pair_id=mp)
        if collect_film:
            return x, films
        return x
