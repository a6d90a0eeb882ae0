"""Pipeline parallelism: GPipe-style microbatch pipelining over a
'stage' mesh axis (shard_map + ppermute).

The reference has no distributed support (SURVEY.md §2); like the rest
of parallel/, this is new TPU-first scaling design. Data/tensor/spatial/
expert sharding (mesh.py) split *within* an op; pipelining splits the
model's *depth*: consecutive shape-preserving blocks live on consecutive
devices, and microbatches stream through, with stage i computing
microbatch j while stage i+1 computes microbatch j-1.

Where it applies in this framework: the UNet's deep homogeneous stacks
(the 9-block C=512 SwinStacks, unet.py:75 stages=[3,3,9,3]) — every
block in a stack preserves [B, H, W, C], so the inter-stage ppermute is
a single fixed-shape collective. Heterogeneous resolution stages (the
enc/dec pyramid) stay on GSPMD sharding; pipelining across them would
need per-edge buffer shapes, which buys nothing at this model scale.

Design notes (TPU-idiomatic):
  * The schedule is a lax.scan over T = M + S - 1 ticks; each tick every
    stage ppermutes its previous output forward one stage and computes
    its block on what it received. Idle ticks compute on don't-care data
    that never reaches the output (the classic GPipe bubble).
  * Differentiable end-to-end: scan's transpose runs the ticks in
    reverse and transposes ppermute(i->i+1) into ppermute(i+1->i), which
    IS reverse-schedule pipeline backprop — no hand-written backward
    schedule.
  * Collectives ride the mesh axis; on hardware, map 'stage' to an ICI
    ring so each edge is a neighbor hop.
"""
from __future__ import annotations

import functools
import inspect
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = _shard_map_mod  # pragma: no cover
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _shmap(f, mesh, in_specs, out_specs):
    """shard_map across JAX versions (check_rep was renamed check_vma)."""
    kw = {}
    params = inspect.signature(shard_map).parameters
    if "check_vma" in params:
        kw["check_vma"] = False
    elif "check_rep" in params:
        kw["check_rep"] = False
    return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     **kw)


def make_pipeline_mesh(num_stages: int, devices=None) -> Mesh:
    """1-axis ('stage',) mesh over the first num_stages devices."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= num_stages, (len(devices), num_stages)
    return Mesh(np.asarray(devices[:num_stages]), ("stage",))


def stack_stage_params(param_trees) -> Any:
    """Stack per-stage param pytrees along a new leading 'stage' axis
    (shard this axis over 'stage' with NamedSharding(mesh, P('stage'))
    so each device holds only its own stage's weights)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)


def pipeline_apply(
    block_fn: Callable[[Any, Any], Any],
    stage_params: Any,
    x: Any,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    axis: str = "stage",
    data_axis: Optional[str] = None,
) -> Any:
    """Run x through S pipelined stages; equals the sequential
    composition block_fn(p[S-1], ... block_fn(p[0], x)).

    block_fn(params_slice, x_mb) -> y_mb must preserve the stream's
    pytree structure and leaf shapes. x may be a single [B, ...] array
    or a pytree of them (e.g. (latents, timesteps) — pass-through
    leaves let per-sample conditioning ride the pipeline with the
    activations). stage_params: pytree with leading axis S
    (stack_stage_params). B must divide into num_microbatches
    (default S).

    data_axis: name of a mesh axis the batch dim is sharded over, for
    combined ('stage', 'data') meshes — pipeline parallelism along
    'stage', plain data parallelism along 'data'. Every stream leaf
    must then have ndim >= 2 ([B, ...] with a real feature dim).
    """
    s = mesh.shape[axis]
    m = num_microbatches or s
    leaves = jax.tree.leaves(x)
    b = leaves[0].shape[0]
    assert all(lf.shape[0] == b for lf in leaves), "stream leaves must share B"
    assert b % m == 0, f"batch {b} not divisible into {m} microbatches"
    x_mb = jax.tree.map(
        lambda a: a.reshape((m, b // m) + a.shape[1:]), x
    )

    def run(params_slice, x_mb):
        params_slice = jax.tree.map(lambda p: p[0], params_slice)
        sid = jax.lax.axis_index(axis)
        fwd = [(i, i + 1) for i in range(s - 1)]

        def tick(carry, t):
            state, outputs = carry
            # receive the upstream stage's previous output (stage 0
            # receives nothing; it reads the next microbatch instead)
            recv = (
                jax.tree.map(lambda a: jax.lax.ppermute(a, axis, fwd), state)
                if s > 1 else state
            )
            mb = jnp.clip(t, 0, m - 1)
            inp = jax.tree.map(
                lambda xm, r: jnp.where(sid == 0, xm[mb], r), x_mb, recv
            )
            out = block_fn(params_slice, inp)
            # the last stage emits microbatch t-(S-1) on ticks >= S-1
            oidx = t - (s - 1)

            def upd(outs, o):
                u = jax.lax.dynamic_update_slice(
                    outs, o[None],
                    (jnp.maximum(oidx, 0),) + (0,) * o.ndim,
                )
                return jnp.where((sid == s - 1) & (oidx >= 0), u, outs)

            outputs = jax.tree.map(upd, outputs, out)
            return (out, outputs), None

        init = (
            jax.tree.map(lambda a: jnp.zeros_like(a[0]), x_mb),
            jax.tree.map(jnp.zeros_like, x_mb),
        )
        (state, outputs), _ = jax.lax.scan(
            tick, init, jnp.arange(m + s - 1)
        )
        # replicate the last stage's outputs to every stage
        return jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(sid == s - 1, o, jnp.zeros_like(o)), axis
            ),
            outputs,
        )

    stream_spec = P(None, data_axis) if data_axis else P()
    out_mb = _shmap(
        run, mesh, in_specs=(P(axis), stream_spec), out_specs=stream_spec
    )(stage_params, x_mb)
    return jax.tree.map(
        lambda o, orig: o.reshape(orig.shape), out_mb, x
    )


def sequential_apply(block_fn, stage_params, x) -> Any:
    """Reference semantics of pipeline_apply (for tests / single device)."""
    s = jax.tree.leaves(stage_params)[0].shape[0]
    for i in range(s):
        x = block_fn(jax.tree.map(lambda p, i=i: p[i], stage_params), x)
    return x
