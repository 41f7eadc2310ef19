"""Pipeline parallelism (parallel/pipeline.py): the GPipe-style microbatch
pipeline over a 'pipe' mesh axis must reproduce the plain sequential
stage loop exactly — forward heads AND parameter gradients (the backward
pipeline emerges from ppermute's transpose, so grad equality proves the
reverse schedule routes gradients to the right stage).

Stage = one hourglass stack body, the natural pipeline unit of the
reference's nstack=2 production default (stackHourglass.py:130-272).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from scd_resnet_tpu.parallel.pipeline import (
    HourglassPipelineStage,
    init_stage_stack,
    pipeline_apply,
    sequential_apply,
)

STAGES = 2
MICRO = 3
MB = 2  # per-microbatch batch


@pytest.fixture(scope="module")
def setup():
    stage = HourglassPipelineStage(
        iterations=2, dimensions=(8, 8, 16), modules=(1, 1, 1),
        prediction_dim=8, head_features=1, pool_downsample=True,
    )
    sample = jnp.zeros((MB, 8, 8, 8), jnp.float32)
    stacked = init_stage_stack(stage, jax.random.PRNGKey(0), sample, STAGES)

    rng = np.random.default_rng(3)
    mbs = jnp.asarray(rng.normal(size=(MICRO, MB, 8, 8, 8)), jnp.float32)

    def apply_fn(variables, x):
        return stage.apply(variables, x, False)

    mesh = Mesh(np.array(jax.devices()[:STAGES]), ("pipe",))
    return apply_fn, stacked, mbs, mesh


def test_forward_matches_sequential(setup):
    apply_fn, stacked, mbs, mesh = setup
    want = sequential_apply(apply_fn, stacked, mbs)
    got = pipeline_apply(apply_fn, stacked, mbs, mesh)
    assert got.shape == want.shape == (STAGES, MICRO, MB, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_sequential(setup):
    apply_fn, stacked, mbs, mesh = setup
    bs = stacked["batch_stats"]

    def loss_pp(params):
        vs = {"params": params, "batch_stats": bs}
        heads = pipeline_apply(apply_fn, vs, mbs, mesh)
        return jnp.sum(heads**2)

    def loss_seq(params):
        vs = {"params": params, "batch_stats": bs}
        heads = sequential_apply(apply_fn, vs, mbs)
        return jnp.sum(heads**2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked["params"])
    g_seq = jax.jit(jax.grad(loss_seq))(stacked["params"])
    flat_pp, tree_pp = jax.tree_util.tree_flatten(g_pp)
    flat_seq, tree_seq = jax.tree_util.tree_flatten(g_seq)
    assert tree_pp == tree_seq
    # every stage must receive a non-zero gradient (the reverse pipeline
    # actually routed them), and values must match the sequential loop
    for a, b in zip(flat_pp, flat_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    total = sum(float(jnp.sum(jnp.abs(a[s]))) for a in flat_pp
                for s in range(STAGES))
    assert total > 0.0
    for s in range(STAGES):
        stage_norm = sum(float(jnp.sum(jnp.abs(a[s]))) for a in flat_pp)
        assert stage_norm > 0.0, f"stage {s} got zero gradient"


def test_four_stage_pipe(setup):
    """Deeper pipe than microbatch-parallel work exists for (S=4, M=3):
    the drain/fill logic must still land every output in the right slot."""
    apply_fn, _, mbs, _ = setup
    stage = HourglassPipelineStage(
        iterations=2, dimensions=(8, 8, 16), modules=(1, 1, 1),
        prediction_dim=8, head_features=1, pool_downsample=True,
    )
    stacked = init_stage_stack(stage, jax.random.PRNGKey(1),
                               jnp.zeros((MB, 8, 8, 8), jnp.float32), 4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    want = sequential_apply(apply_fn, stacked, mbs)
    got = pipeline_apply(apply_fn, stacked, mbs, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
