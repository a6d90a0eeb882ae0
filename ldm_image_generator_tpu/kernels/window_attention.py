"""Fused windowed multi-head self-attention (Pallas TPU kernel).

The UNet's window attention runs MHA over many small windows (ws^2 = 36
tokens each, attention.py:43-51 semantics). The XLA lowering writes
q/k/v/scores/probs to HBM between matmuls; this kernel processes a tile
of TN windows per grid step entirely in VMEM:

    x[TN*L, C] -> qkv projections (MXU) -> per-window per-head scores
    [TN, H, L, L] (fp32, never leaves VMEM) -> masked softmax ->
    attention-weighted values -> output projection -> y[TN*L, C]

The projection weights use constant index maps, so Mosaic keeps them
resident across grid steps. No online softmax is needed — a whole
window's scores fit comfortably in VMEM. The key-padding mask travels as
a float additive bias (0 / -1e9), sidestepping packed-bool layouts.

Training: fused_window_mha carries a custom VJP whose backward pass is
the XLA reference implementation's VJP (forward recompute) — gradients
flow, and the backward matmuls are plain XLA.

Status (round 3): engaged on every self-attention stage by the 'auto'
backend (models/layers.MultiHeadAttention) — measured in-model
(benchmarks/attn_inmodel.py, full default UNet denoise b64/t64) at
17.0 ms vs 22.4 ms XLA-everywhere. Round-3 kernel scheme:
- the q/k/v projections run as ONE [C, 3C] matmul (3x the N dim of
  three separate C x C matmuls; fewer dispatches, better MXU tiling);
- heads fold in groups of f into a block-diagonal joint matmul
  [TN, f*L, f*d] (Mosaic's tpu.matmul takes one batch dim, so unfolded
  heads would loop statically over tiny [TN, L, L] matmuls at <10% MXU
  utilization; the (TN*H)-batching 4-D transpose crashes this
  environment's Mosaic compiler — benchmarks/mosaic_repro.py). Folding
  inflates the score/value matmul FLOPs by f^2, so the measured
  optimum is small: f=2 at 36-token windows, f=8 at <=16-token
  full-map stages (see MultiHeadAttention for the sweep numbers);
- only k and v tiles carry the block-diagonal 0/1 mask; q tiles ride
  unmasked (the -inf additive score mask already isolates the diagonal
  blocks), saving one [TN, f*L, f*d] VPU multiply per group.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def window_mha_xla(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads: int):
    """Reference implementation. x: [N, L, C]; mask: [N, L] bool or None."""
    n, l, c = x.shape
    h = num_heads
    d = c // h
    q = (x @ wq + bq).reshape(n, l, h, d)
    k = (x @ wk + bk).reshape(n, l, h, d)
    v = (x @ wv + bv).reshape(n, l, h, d)
    scores = jnp.einsum("nlhd,nshd->nhls", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(d).astype(jnp.float32))
    if mask is not None:
        scores = scores + jnp.where(mask[:, None, None, :], NEG_INF, 0.0)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("nhls,nshd->nlhd", probs, v).reshape(n, l, c)
    return out @ wo + bo


def _fold_groups(num_heads: int, fold: int):
    """Partition heads into contiguous groups of at most `fold`."""
    groups = []
    h0 = 0
    while h0 < num_heads:
        f = min(fold, num_heads - h0)
        groups.append((h0, f))
        h0 += f
    return groups


def _make_kernel(num_heads: int, tn: int, l: int, c: int, out_dtype,
                 fold: int = 1):
    d = c // num_heads
    scale = 1.0 / float(d) ** 0.5
    groups = _fold_groups(num_heads, fold)

    def kernel(x_ref, bias_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, out_ref):
        x = x_ref[:].reshape(tn * l, c)

        def dot(a, w_ref, b_ref):
            y = jax.lax.dot_general(
                a, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[:].astype(jnp.float32)  # b_ref: [1, D]
            return y.astype(x.dtype)

        # single [C, 3C] projection: one MXU op at 3x the N dim instead
        # of three C x C matmuls (fewer dispatches, better tiling)
        qkv = dot(x, wqkv_ref, bqkv_ref)
        q = qkv[:, 0 * c:1 * c].reshape(tn, l, c)
        k = qkv[:, 1 * c:2 * c].reshape(tn, l, c)
        v = qkv[:, 2 * c:3 * c].reshape(tn, l, c)
        bias = bias_ref[:]  # [TN, L]

        # Mosaic's tpu.matmul supports a single batch dim. fold == 1:
        # static per-head loop of [TN, L, L] matmuls (the round-2
        # kernel). fold == f > 1: f heads share ONE block-diagonal
        # joint matmul [TN, f*L, f*d] — at L=36, d=32 the per-head
        # matmul uses a sliver of the 128x128 MXU tile, so folding
        # heads until f*L/f*d approach 128 multiplies utilization.
        # The folded operands are built WITHOUT transposes (tile along
        # the token axis + constant 0/1 block mask): the natural
        # [TN, L, H, d] -> [TN, H, L, d] batching transpose and 4-D
        # in-kernel ops are what crash this environment's Mosaic
        # compiler (see benchmarks/mosaic_repro.py).
        #   q~[(h,l), (h,d)] block-diagonal => q~ @ k~^T is zero off
        # the diagonal blocks (disjoint column support), the -inf
        # additive block mask makes the joint softmax exactly the f
        # per-head softmaxes, and out~ = probs~ @ v~ has disjoint
        # column support per row block, so summing the f row blocks
        # assembles the group's [TN, L, f*d] output with no masking.
        outs = []
        for h0, f in groups:
            qg = q[:, :, h0 * d : (h0 + f) * d]
            kg = k[:, :, h0 * d : (h0 + f) * d]
            vg = v[:, :, h0 * d : (h0 + f) * d]
            if f == 1:
                scores = jax.lax.dot_general(
                    qg, kg,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [TN, L, S]
                scores = scores * scale + bias[:, None, :]
                probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
                outs.append(
                    jax.lax.dot_general(
                        probs, vg,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype)
                )  # [TN, L, D]
                continue

            # block masks, built in-kernel from iota (pallas_call rejects
            # captured array constants): block-diagonal 0/1 over
            # [f*L, f*d] and additive 0/-inf over [f*L, f*L]
            ri = jax.lax.broadcasted_iota(jnp.int32, (f * l, f * d), 0) // l
            ci = jax.lax.broadcasted_iota(jnp.int32, (f * l, f * d), 1) // d
            diag_c = (ri == ci).astype(x.dtype)
            rb = jax.lax.broadcasted_iota(jnp.int32, (f * l, f * l), 0) // l
            cb = jax.lax.broadcasted_iota(jnp.int32, (f * l, f * l), 1) // l
            blk_c = jnp.where(rb == cb, jnp.float32(0.0),
                              jnp.float32(NEG_INF))

            # q tiles UNMASKED: with kt masked to feature block j, the
            # score at (row block i, col block j) contracts only head
            # j's features regardless of i — the -inf blk_c then keeps
            # exactly the diagonal i == j, so masking q too would be
            # redundant work (one [TN, fL, fd] VPU multiply saved).
            tile = lambda a: jnp.concatenate([a] * f, axis=1)
            qt = tile(qg)
            kt = tile(kg) * diag_c
            vt = tile(vg) * diag_c
            scores = jax.lax.dot_general(
                qt, kt,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [TN, fL, fL]
            kbias = jnp.concatenate([bias] * f, axis=-1)  # [TN, fL]
            scores = scores * scale + blk_c[None] + kbias[:, None, :]
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            og = jax.lax.dot_general(
                probs, vt,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [TN, fL, fd]; row block h has support on column block h
            acc = og[:, 0:l, :]
            for i in range(1, f):
                acc = acc + og[:, i * l:(i + 1) * l, :]
            outs.append(acc.astype(x.dtype))
        out = jnp.concatenate(outs, axis=-1).reshape(tn * l, c)
        out_ref[:] = dot(out, wo_ref, bo_ref).reshape(tn, l, c).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "tile_windows", "interpret", "fold"),
)
def window_mha_pallas(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                      num_heads: int, tile_windows: int = 0,
                      interpret: bool = False, fold: int = 1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, l, c = x.shape
    if tile_windows == 0:
        import os

        # measured in-model at b64/t64 (benchmarks/attn_inmodel.py,
        # LDM_ATTN_TN sweep): 16 windows/tile 17.33 ms vs 8 -> 17.52;
        # 4 violates Mosaic's (8,128) block divisibility, 32 crashes the
        # remote compiler. LDM_ATTN_TN overrides for tuning sweeps.
        tile_windows = int(os.environ.get("LDM_ATTN_TN", "0")) or 16
    tn = min(tile_windows, n)
    if mask is None:
        bias = jnp.zeros((n, l), dtype=jnp.float32)
    else:
        bias = jnp.where(mask, jnp.float32(NEG_INF), jnp.float32(0.0))
    n_pad = (-n) % tn
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0), (0, 0)))
        # padded windows keep bias 0 (valid) so softmax stays finite;
        # their outputs are cropped below
        bias = jnp.pad(bias, ((0, n_pad), (0, 0)))
    nt = (n + n_pad) // tn

    # one [C, 3C] projection operand; the concat is loop-invariant in a
    # sampling scan (XLA hoists it) and trivial traffic elsewhere
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    bqkv = jnp.concatenate(
        [bq.reshape(1, c), bk.reshape(1, c), bv.reshape(1, c)], axis=1
    )
    out = pl.pallas_call(
        _make_kernel(num_heads, tn, l, c, x.dtype, fold=fold),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, l, c), x.dtype),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tn, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, bias, wqkv, bqkv, wo, bo.reshape(1, c))
    return out[:n]


def _make_bwd_kernel(num_heads: int, tn: int, l: int, c: int, nt: int,
                     in_dtype, fold: int = 1):
    """Backward kernel: recomputes qkv/probs per window tile IN VMEM
    (none of the forward intermediates ever round-trip HBM) and emits
    dx + fp32 weight grads. Weight grads accumulate in fp32 scratch
    across the 1-D grid and are written ONCE at the last step — the
    constant-index accumulating-OUTPUT pattern is mis-scheduled by this
    Mosaic build (see kernels/ffn_block.py round-4 notes), scratch is
    not. Bias grads travel as 8-sublane blocks (row 0 = value) for the
    same reason."""
    d = c // num_heads
    scale = 1.0 / float(d) ** 0.5
    groups = _fold_groups(num_heads, fold)

    def kernel(x_ref, bias_ref, g_ref, wqkv_ref, bqkv_ref, wo_ref,
               dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
               swqkv, sbqkv, swo, sbo):
        from jax.experimental import pallas as pl

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _zero():
            swqkv[...] = jnp.zeros_like(swqkv)
            sbqkv[...] = jnp.zeros_like(sbqkv)
            swo[...] = jnp.zeros_like(swo)
            sbo[...] = jnp.zeros_like(sbo)

        x = x_ref[:].reshape(tn * l, c)
        g2d = g_ref[:].reshape(tn * l, c)
        bias = bias_ref[:]  # [TN, L]

        def mm(a, b, dims):
            return jax.lax.dot_general(a, b, (dims, ((), ())),
                                       preferred_element_type=jnp.float32)

        def bmm(a, b, dims, batch=((0,), (0,))):
            return jax.lax.dot_general(a, b, (dims, batch),
                                       preferred_element_type=jnp.float32)

        # ---- recompute the forward (all in VMEM) ----
        qkv = (mm(x, wqkv_ref[:], ((1,), (0,)))
               + bqkv_ref[:].reshape(-1, 3 * c)[0:1].astype(jnp.float32)
               ).astype(x.dtype)
        q = qkv[:, 0 * c:1 * c].reshape(tn, l, c)
        k = qkv[:, 1 * c:2 * c].reshape(tn, l, c)
        v = qkv[:, 2 * c:3 * c].reshape(tn, l, c)

        # d(out-projection): y = out @ wo + bo
        dout = mm(g2d, wo_ref[:], ((1,), (1,))).astype(x.dtype)
        dout3 = dout.reshape(tn, l, c)
        sbo[...] = sbo[...] + jnp.pad(
            jnp.sum(g2d.astype(jnp.float32), axis=0, keepdims=True),
            ((0, 7), (0, 0)))

        out_cols = []   # recomputed `out` group slices (for dwo)
        dq_cols, dk_cols, dv_cols = [], [], []
        for h0, f in groups:
            qg = q[:, :, h0 * d:(h0 + f) * d]
            kg = k[:, :, h0 * d:(h0 + f) * d]
            vg = v[:, :, h0 * d:(h0 + f) * d]
            dacc = dout3[:, :, h0 * d:(h0 + f) * d]
            if f == 1:
                scores = bmm(qg, kg, ((2,), (2,))) * scale + bias[:, None, :]
                probs32 = jax.nn.softmax(scores, axis=-1)
                probs = probs32.astype(x.dtype)
                out_cols.append(
                    bmm(probs, vg, ((2,), (1,))).astype(x.dtype))
                dprobs = bmm(dacc, vg, ((2,), (2,)))          # [TN,L,S]
                dvg = bmm(probs, dacc, ((1,), (1,)))          # [TN,S,D]
                ds = probs32 * (
                    dprobs - jnp.sum(dprobs * probs32, axis=-1,
                                     keepdims=True))
                dsb = (ds * scale).astype(x.dtype)
                dq_cols.append(bmm(dsb, kg, ((2,), (1,))).astype(x.dtype))
                dk_cols.append(bmm(dsb, qg, ((1,), (1,))).astype(x.dtype))
                dv_cols.append(dvg.astype(x.dtype))
                continue

            ri = jax.lax.broadcasted_iota(jnp.int32, (f * l, f * d), 0) // l
            ci = jax.lax.broadcasted_iota(jnp.int32, (f * l, f * d), 1) // d
            diag_c = (ri == ci).astype(x.dtype)
            rb = jax.lax.broadcasted_iota(jnp.int32, (f * l, f * l), 0) // l
            cb = jax.lax.broadcasted_iota(jnp.int32, (f * l, f * l), 1) // l
            blk_c = jnp.where(rb == cb, jnp.float32(0.0),
                              jnp.float32(NEG_INF))

            tile = lambda a: jnp.concatenate([a] * f, axis=1)
            qt = tile(qg)
            kt = tile(kg) * diag_c
            vt = tile(vg) * diag_c
            scores = bmm(qt, kt, ((2,), (2,))) * scale
            kbias = jnp.concatenate([bias] * f, axis=-1)
            scores = scores + blk_c[None] + kbias[:, None, :]
            probs32 = jax.nn.softmax(scores, axis=-1)
            probs = probs32.astype(x.dtype)
            og = bmm(probs, vt, ((2,), (1,)))                 # [TN,fL,fD]
            acc = og[:, 0:l, :]
            for j in range(1, f):
                acc = acc + og[:, j * l:(j + 1) * l, :]
            out_cols.append(acc.astype(x.dtype))

            dog = tile(dacc)                                  # [TN,fL,fD]
            dprobs = bmm(dog, vt, ((2,), (2,)))               # [TN,fL,fL]
            dvt = bmm(probs, dog, ((1,), (1,)))               # [TN,fL,fD]
            ds = probs32 * (
                dprobs - jnp.sum(dprobs * probs32, axis=-1, keepdims=True))
            dsb = (ds * scale).astype(x.dtype)
            dqt = bmm(dsb, kt, ((2,), (1,)))                  # [TN,fL,fD]
            dkt = bmm(dsb, qt, ((1,), (1,)))                  # [TN,fL,fD]
            dkt = dkt.astype(x.dtype) * diag_c
            dvt = dvt.astype(x.dtype) * diag_c

            def unfold(a):
                s = a[:, 0:l, :]
                for j in range(1, f):
                    s = s + a[:, j * l:(j + 1) * l, :]
                return s

            dq_cols.append(unfold(dqt.astype(x.dtype)).astype(x.dtype))
            dk_cols.append(unfold(dkt))
            dv_cols.append(unfold(dvt))

        out2d = jnp.concatenate(out_cols, axis=-1).reshape(tn * l, c)
        swo[...] = swo[...] + mm(out2d, g2d, ((0,), (0,)))

        dq = jnp.concatenate(dq_cols, axis=-1)
        dk = jnp.concatenate(dk_cols, axis=-1)
        dv = jnp.concatenate(dv_cols, axis=-1)
        dqkv = jnp.concatenate(
            [dq.reshape(tn * l, c), dk.reshape(tn * l, c),
             dv.reshape(tn * l, c)], axis=-1)                 # [N, 3C]

        dx = mm(dqkv, wqkv_ref[:], ((1,), (1,)))
        dx_ref[:] = dx.astype(in_dtype).reshape(tn, l, c)

        swqkv[...] = swqkv[...] + mm(x, dqkv, ((0,), (0,)))
        sbqkv[...] = sbqkv[...] + jnp.pad(
            jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True),
            ((0, 7), (0, 0)))

        @pl.when(i == nt - 1)
        def _write():
            dwqkv_ref[...] = swqkv[...]
            dbqkv_ref[...] = sbqkv[...]
            dwo_ref[...] = swo[...]
            dbo_ref[...] = sbo[...]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "tile_windows", "interpret", "fold"),
)
def window_mha_bwd_pallas(x, mask, g, wq, bq, wk, bk, wv, bv, wo, bo,
                          num_heads: int, tile_windows: int = 0,
                          interpret: bool = False, fold: int = 1):
    """Fused backward for window MHA. x: [N, L, C], g: out-cotangent
    [N, L, C]. Returns (dx, dwqkv [C,3C] f32, dbqkv [3C] f32,
    dwo [C,C] f32, dbo [C] f32) — the caller splits dwqkv/dbqkv into
    per-projection grads."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, l, c = x.shape
    if tile_windows == 0:
        import os

        # The backward's Mosaic STACK temporaries scale with tn*l*c
        # (fp32 qkv recompute + dqkv concat dominate): tn=16 at
        # C=512/L=36 needs 20.46MB scoped vmem vs the 16MB limit
        # (measured v5e AOT OOM, benchmarks/attn_bwd_truth_check.py);
        # tn=8 fits and keeps (8,128) divisibility (8*36 rows).
        tile_windows = (int(os.environ.get("LDM_ATTN_BWD_TN", "0"))
                        or (16 if c <= 256 else 8))
    tn = min(tile_windows, n)
    if mask is None:
        bias = jnp.zeros((n, l), dtype=jnp.float32)
    else:
        bias = jnp.where(mask, jnp.float32(NEG_INF), jnp.float32(0.0))
    n_pad = (-n) % tn
    if n_pad:
        # zero x/g rows contribute nothing to any grad
        x = jnp.pad(x, ((0, n_pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, n_pad), (0, 0), (0, 0)))
        bias = jnp.pad(bias, ((0, n_pad), (0, 0)))
    nt = (n + n_pad) // tn

    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    bqkv = jnp.pad(jnp.concatenate(
        [bq.reshape(1, c), bk.reshape(1, c), bv.reshape(1, c)], axis=1
    ), ((0, 7), (0, 0)))  # 8-sublane bias blocks (kernels/ffn_block.py)

    f32 = jnp.float32
    tile3 = lambda: pl.BlockSpec((tn, l, c), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    const2 = lambda r, cc: pl.BlockSpec((r, cc), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_bwd_kernel(num_heads, tn, l, c, nt, x.dtype, fold=fold),
        grid=(nt,),
        in_specs=[
            tile3(),
            pl.BlockSpec((tn, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            tile3(),
            const2(c, 3 * c), const2(8, 3 * c), const2(c, c),
        ],
        out_specs=[
            tile3(),
            const2(c, 3 * c), const2(8, 3 * c),
            const2(c, c), const2(8, c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n + n_pad, l, c), x.dtype),
            jax.ShapeDtypeStruct((c, 3 * c), f32),
            jax.ShapeDtypeStruct((8, 3 * c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((8, c), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, 3 * c), f32),
            pltpu.VMEM((8, 3 * c), f32),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((8, c), f32),
        ],
        interpret=interpret,
    )(x, bias, g, wqkv, bqkv, wo)
    dx, dwqkv, dbqkv, dwo, dbo = outs
    return (dx[:n], dwqkv, dbqkv[0], dwo, dbo[0])


def _attn_bwd_usable(x, c: int) -> bool:
    """Pallas attention backward availability. Hardware-validated
    envelope (benchmarks/attn_bwd_truth_check.py, v5e 2026-08-19): at
    C=128/256/512 every gradient is as close or closer to the fp64
    torch truth than the XLA recompute VJP (worst ratio 1.11), so those
    windowed stages default to the Pallas backward. The C=1024 16-token
    full-map stage (fold 8) crashes the remote Mosaic compiler and
    stays on the XLA VJP. LDM_ATTN_BWD=xla forces off;
    LDM_ATTN_BWD=pallas lifts the C cap (truth-check use only)."""
    import os

    mode = os.environ.get("LDM_ATTN_BWD", "")
    if mode == "xla":
        return False
    if mode != "pallas" and c > 512:
        return False  # C=1024 fold-8 backward crashes Mosaic (see above)
    return (
        jax.default_backend() in ("tpu", "axon")
        and c % 128 == 0
        and jnp.dtype(x.dtype).itemsize == 2
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_window_mha(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                     num_heads: int, fold: int = 1):
    """Differentiable fused window MHA: Pallas forward, XLA-VJP backward."""
    return window_mha_pallas(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                             num_heads=num_heads, fold=fold)


def _fwd(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, fold):
    out = window_mha_pallas(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                            num_heads=num_heads, fold=fold)
    return out, (x, mask, wq, bq, wk, bk, wv, bv, wo, bo)


# hardware-validated attention-backward (L, C, fold) tuples
# (benchmarks/attn_bwd_truth_check.py + benchmarks/attn_bwd_ab.py, v5e
# 2026-08-19: accuracy <= 1.11x the XLA VJP's fp64 distance on every
# gradient AND 13% faster in-model at b64). Signatures outside this set
# at C<=512 are NOT rejected but must pass a one-time compile probe
# first (pallas_usable force_probe): the remote Mosaic compiler crashes
# on some constructions (C=1024 fold-8), so an unvalidated shape never
# reaches the training hot path unprobed.
_BWD_VALIDATED = {(36, 128, 2), (36, 256, 2), (36, 512, 2)}


def _bwd(num_heads, fold, res, g):
    x, mask, wq, bq, wk, bk, wv, bv, wo, bo = res
    c = x.shape[-1]
    if _attn_bwd_usable(x, c):
        from ldm_image_generator_tpu.kernels.dispatch import pallas_usable

        validated = (x.shape[1], c, fold) in _BWD_VALIDATED
        sig = ("attn_bwd", x.shape, jnp.dtype(x.dtype).name,
               mask is not None, num_heads, fold)
        thunk = lambda: window_mha_bwd_pallas.lower(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            None if mask is None else jax.ShapeDtypeStruct(
                mask.shape, mask.dtype),
            jax.ShapeDtypeStruct(x.shape, g.dtype),
            *[jax.ShapeDtypeStruct(w.shape, w.dtype) for w in
              (wq, bq, wk, bk, wv, bv, wo, bo)],
            num_heads=num_heads, fold=fold,
        ).compile()
        if pallas_usable("window_attention_bwd", sig, thunk,
                         force_probe=not validated):
            dx, dwqkv, dbqkv, dwo, dbo = window_mha_bwd_pallas(
                x, mask, g, wq, bq, wk, bk, wv, bv, wo, bo,
                num_heads=num_heads, fold=fold,
            )
            cast = lambda a, r: a.astype(r.dtype)
            return (dx, None,
                    cast(dwqkv[:, 0 * c:1 * c], wq),
                    cast(dbqkv[0 * c:1 * c], bq),
                    cast(dwqkv[:, 1 * c:2 * c], wk),
                    cast(dbqkv[1 * c:2 * c], bk),
                    cast(dwqkv[:, 2 * c:3 * c], wv),
                    cast(dbqkv[2 * c:3 * c], bv),
                    cast(dwo, wo), cast(dbo, bo))
    _, vjp = jax.vjp(
        lambda x, wq, bq, wk, bk, wv, bv, wo, bo: window_mha_xla(
            x, mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
        ),
        x, wq, bq, wk, bk, wv, bv, wo, bo,
    )
    dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo = vjp(g)
    return dx, None, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo


fused_window_mha.defvjp(_fwd, _bwd)
