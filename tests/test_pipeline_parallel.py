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


def make_stage_data_mesh(s, dp):
    import numpy as _np

    devs = jax.devices()[: s * dp]
    return jax.sharding.Mesh(
        _np.asarray(devs).reshape(s, dp), ("stage", "data")
    )


def test_pipeline_pytree_stream_with_data_axis():
    """(x, t) pytree stream over a combined ('stage','data') mesh: the
    pass-through t leaf rides the pipeline, batch stays data-sharded."""
    s, dp, m, d = 2, 2, 4, 16
    mesh = make_stage_data_mesh(s, dp)
    params = make_dense_stages(s, d, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (m * 2, d))
    t = jnp.arange(m * 2, dtype=jnp.float32)[:, None]

    def block(p, stream):
        xx, tt = stream
        return (jnp.tanh(xx @ p["w"] + p["b"]) + xx + 0.01 * tt, tt)

    y_seq, t_seq = sequential_apply(block, params, (x, t))
    y_pp, t_pp = jax.jit(
        lambda p, st: pipeline_apply(block, p, st, mesh,
                                     num_microbatches=m,
                                     data_axis="data")
    )(params, (x, t))
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(t_pp), np.asarray(t_seq))


def _pipeline_test_cfg():
    from ldm_image_generator_tpu.config import UNetConfig

    return UNetConfig(
        input_channels=4,
        stages=(4, 2),
        channels=(16, 32),
        head_dim=8,
        stochastic_depth=0.0,
        fixed_expert_indices=(0, 1),
    )


def test_pipelined_unet_matches_plain():
    """pipelined_unet_apply == UNet.apply on the same params: the deep
    encoder stack (4 homogeneous blocks) pipelines over 2 stages x 2
    data shards; decoder attention tails run sequentially."""
    from ldm_image_generator_tpu.models.unet import UNet
    from ldm_image_generator_tpu.parallel.pipelined_unet import (
        pipelined_unet_apply,
    )

    cfg = _pipeline_test_cfg()
    mesh = make_stage_data_mesh(2, 2)
    unet = UNet(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 8, 8, cfg.input_channels))
    t = jnp.array([3, 500, 999, 250], jnp.int32)
    params = unet.init({"params": key, "moe": key}, x, t)

    y_plain = unet.apply(params, x, t, deterministic=True)
    y_pp = jax.jit(
        lambda p, x, t: pipelined_unet_apply(
            cfg, p, x, t, mesh, deterministic=True, dtype=jnp.float32
        )
    )(params, x, t)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_plain),
                               rtol=1e-4, atol=5e-5)


def test_pipelined_train_step_matches_plain_loss():
    """make_ldm_train_step(apply_fn=pipelined forward) computes the same
    loss and produces finite updated params."""
    import functools

    import optax

    from ldm_image_generator_tpu.config import DDPMConfig
    from ldm_image_generator_tpu.diffusion import make_schedule
    from ldm_image_generator_tpu.models.unet import UNet
    from ldm_image_generator_tpu.parallel.pipelined_unet import (
        pipelined_unet_apply,
    )
    from ldm_image_generator_tpu.train import (
        LDMTrainState, make_ldm_train_step,
    )

    cfg = _pipeline_test_cfg()
    mesh = make_stage_data_mesh(2, 2)
    unet = UNet(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 8, 8, cfg.input_channels))
    t0 = jnp.zeros((4,), jnp.int32)
    params = unet.init({"params": key, "moe": key}, x, t0)
    schedule = make_schedule(DDPMConfig())
    tx = optax.adamw(1e-4)

    def pp_apply(p, x_t, t, cond, det, rngs):
        return pipelined_unet_apply(
            cfg, p, x_t, t, mesh, cond=cond, rngs=rngs,
            deterministic=det, dtype=jnp.float32,
        )

    mk = functools.partial(
        make_ldm_train_step, unet, schedule, tx, stochastic_depth=False
    )
    state = LDMTrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))
    s_pp, m_pp = jax.jit(mk(apply_fn=pp_apply))(state, x, key)
    s_pl, m_pl = jax.jit(mk())(state, x, key)
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_pl["loss"]),
                               rtol=1e-4)
    leaves = jax.tree.leaves(s_pp.params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_pipeline_single_stage_degenerates():
    mesh = make_pipeline_mesh(1)
    params = make_dense_stages(1, 8, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    y = pipeline_apply(dense_block, params, x, mesh, num_microbatches=1)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(sequential_apply(dense_block, params, x)),
        rtol=1e-6,
    )
