"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a
'stage' mesh axis must match the sequential composition exactly, forward
and backward, on the virtual-device CPU mesh (conftest provides 8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_image_generator_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_apply,
    sequential_apply,
    stack_stage_params,
)


def dense_block(params, x):
    w, b = params["w"], params["b"]
    return jnp.tanh(x @ w + b) + x


def make_dense_stages(s, d, key):
    trees = []
    for i in range(s):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        trees.append({
            "w": jax.random.normal(k1, (d, d)) * 0.2,
            "b": jax.random.normal(k2, (d,)) * 0.1,
        })
    return stack_stage_params(trees)


@pytest.mark.parametrize("s,m", [(4, 4), (4, 8), (2, 2), (8, 8)])
def test_pipeline_matches_sequential(s, m):
    mesh = make_pipeline_mesh(s)
    d = 16
    params = make_dense_stages(s, d, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (m * 2, d))
    y_seq = sequential_apply(dense_block, params, x)
    y_pp = jax.jit(
        lambda p, x: pipeline_apply(dense_block, p, x, mesh,
                                    num_microbatches=m)
    )(params, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential():
    s, m, d = 4, 4, 8
    mesh = make_pipeline_mesh(s)
    params = make_dense_stages(s, d, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (m, d))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (m, d))

    def loss_pp(p):
        y = pipeline_apply(dense_block, p, x, mesh, num_microbatches=m)
        return jnp.mean((y - tgt) ** 2)

    def loss_seq(p):
        y = sequential_apply(dense_block, p, x)
        return jnp.mean((y - tgt) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_seq = jax.grad(loss_seq)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g_pp, g_seq,
    )


def test_pipeline_swinblock_stack():
    """Pipeline the framework's real block: a homogeneous SwinBlock
    sequence (the UNet's deep stacks are exactly this shape)."""
    from ldm_image_generator_tpu.models.layers import SwinBlock

    s = 4
    mesh = make_pipeline_mesh(s)
    c = 16
    block = SwinBlock(c, head_dim=8, window_size=6, attention=False,
                      stochastic_depth=0.0, fixed_expert_indices=(0, 1))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, c))
    t = jnp.full((1,), 500, jnp.int32)
    trees = [
        block.init({"params": jax.random.PRNGKey(10 + i)}, x, t)
        for i in range(s)
    ]
    params = stack_stage_params(trees)

    def block_fn(p, xmb):
        return block.apply(p, xmb, t, deterministic=True)

    y_seq = sequential_apply(block_fn, params, x)
    y_pp = jax.jit(
        lambda p, x: pipeline_apply(block_fn, p, x, mesh,
                                    num_microbatches=4)
    )(params, x)
    # fp32 reassociation across the shard_map boundary: ~5e-6 drift
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq),
                               rtol=1e-4, atol=5e-5)


def test_pipeline_single_stage_degenerates():
    mesh = make_pipeline_mesh(1)
    params = make_dense_stages(1, 8, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    y = pipeline_apply(dense_block, params, x, mesh, num_microbatches=1)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(sequential_apply(dense_block, params, x)),
        rtol=1e-6,
    )
