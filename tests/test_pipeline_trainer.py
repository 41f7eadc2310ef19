"""Config-reachable pipeline-parallel TRAINING (round-5, VERDICT #1
stretch): a 'pipe' mesh axis turns the factory's hourglass forward into
the GPipe schedule over the PLAIN CenterNetHourglass parameter tree —
same checkpoints, same optimizer, same validation.

Equality anchor: with ONE microbatch the pipelined forward sees the full
batch, so outputs, updated BN statistics, and parameter gradients must
match the plain ``model.apply(train=True)`` exactly (fp-order tolerance).
Multi-microbatch runs are pinned against the sequential microbatch loop
in tests/test_pipeline_parallel.py semantics (per-microbatch BN — the
standard pipeline-parallel treatment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from scd_resnet_tpu.models.hourglass import StackHourglass
from scd_resnet_tpu.parallel.pipeline import make_pipelined_stack_forward

STACKS = 2
GEO = dict(iterations=2, dimensions=(8, 8, 16), modules=(1, 1, 1),
           prediction_dim=8)
TERMS = (("heatmap", 1, -2.19), ("regr", 4, None), ("offset", 2, None))


@pytest.fixture(scope="module")
def plain_setup():
    model = StackHourglass(
        hourglass_iterations=GEO["iterations"], stacks=STACKS,
        dimensions=GEO["dimensions"], modules=GEO["modules"],
        prediction_dim=GEO["prediction_dim"], terminals=TERMS,
        pool_downsample=False)
    rng = np.random.default_rng(11)
    xs = jnp.asarray(rng.normal(size=(4, 32, 32, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xs, train=True)
    return model, variables, xs


def _pipelined(n_micro):
    mesh = Mesh(np.array(jax.devices()[:STACKS]), ("pipe",))
    return make_pipelined_stack_forward(
        mesh, STACKS, n_micro, terminals=TERMS, **GEO)


def test_single_microbatch_matches_plain_forward(plain_setup):
    """M=1: the pipeline sees the full batch per stage, so heads AND the
    mutated BN statistics reproduce the plain training forward."""
    model, variables, xs = plain_setup
    params = {"StackHourglass_0": variables["params"]}
    stats = {"StackHourglass_0": variables["batch_stats"]}

    want_outs, want_mut = model.apply(variables, xs, train=True,
                                      mutable=["batch_stats"])
    got_outs, got_mut = _pipelined(1)(params, stats, xs)

    assert len(got_outs) == len(want_outs) == STACKS
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        got_outs, list(want_outs))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        got_mut["batch_stats"]["StackHourglass_0"],
        want_mut["batch_stats"])


def test_single_microbatch_matches_plain_gradients(plain_setup):
    """Parameter gradients through the pipelined schedule + the pure tree
    restructuring land on the PLAIN tree and match plain backprop — the
    checkpoint-compatibility proof for pipelined training."""
    model, variables, xs = plain_setup
    bs = variables["batch_stats"]
    forward_pp = _pipelined(1)

    def loss_plain(p):
        outs, _ = model.apply({"params": p, "batch_stats": bs}, xs,
                              train=True, mutable=["batch_stats"])
        return sum(jnp.sum(h ** 2)
                   for h in jax.tree_util.tree_leaves(list(outs)))

    def loss_pp(p):
        outs, _ = forward_pp({"StackHourglass_0": p},
                             {"StackHourglass_0": bs}, xs)
        return sum(jnp.sum(h ** 2) for h in jax.tree_util.tree_leaves(outs))

    g_plain = jax.jit(jax.grad(loss_plain))(variables["params"])
    g_pp = jax.jit(jax.grad(loss_pp))(variables["params"])
    flat_a, tree_a = jax.tree_util.tree_flatten(g_plain)
    flat_b, tree_b = jax.tree_util.tree_flatten(g_pp)
    assert tree_a == tree_b  # gradients in the PLAIN layout
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


def test_multi_microbatch_runs_and_is_finite(plain_setup):
    """M=3 (uneven pipe fill, drain ticks masked): heads finite, BN stats
    moved, gradients finite and nonzero for every stage's params."""
    model, variables, xs = plain_setup
    xs6 = jnp.concatenate([xs, xs[:2]], axis=0)  # 6 rows -> 3 microbatches
    forward_pp = _pipelined(3)

    outs, mut = forward_pp({"StackHourglass_0": variables["params"]},
                           {"StackHourglass_0": variables["batch_stats"]},
                           xs6)
    for leaf in jax.tree_util.tree_leaves(outs):
        assert leaf.shape[0] == 6
        assert bool(jnp.isfinite(leaf).all())

    def loss(p):
        o, _ = forward_pp({"StackHourglass_0": p},
                          {"StackHourglass_0": variables["batch_stats"]},
                          xs6)
        return sum(jnp.sum(h ** 2) for h in jax.tree_util.tree_leaves(o))

    grads = jax.jit(jax.grad(loss))(variables["params"])
    for key in ("Hourglass_0", "Hourglass_1", "heatmap_0", "heatmap_1"):
        sub = jax.tree_util.tree_leaves(grads[key])
        assert all(bool(jnp.isfinite(g).all()) for g in sub)
        assert any(float(jnp.abs(g).sum()) > 0 for g in sub)


def test_factory_pipelined_training_config_reachable(tmp_path):
    """The whole chain from exp.json keys: meshShape [2,2] + meshAxes
    ['data','pipe'] + centerOffsetHourglass2 -> the factory builds the
    dp=2 x pp=2 mesh, swaps in the GPipe forward (production geometry),
    and a train step executes with a finite loss on the plain tree.
    (~2.5 min: one compile of the 49M-param pipelined step on CPU.)"""
    from scd_resnet_tpu.core.config import Configuration
    from scd_resnet_tpu.data.dataset import SCDDataset
    from scd_resnet_tpu.data.synthetic import make_archive
    from scd_resnet_tpu.train.factory import NetworkFactory

    archive = str(tmp_path / "scdx16p100.d")
    make_archive(archive, num_images=2, reps=2, clips_per_image=6, size=128)
    cfg = Configuration()
    cfg.update_config({
        "datasetName": "scdx16p100", "modelName": "centerOffsetHourglass2",
        "trainName": "ppfac", "batchSize": 4, "validationBatchSize": 4,
        "iterations": 1, "validation": 100, "snapshot": 100,
        "learningRate": 1e-3, "residency": "host",
        "meshShape": [2, 2], "meshAxes": ["data", "pipe"],
        "pipelineMicrobatches": 2,
        "dirTemp": str(tmp_path / "temp") + "/",
        "dirResult": str(tmp_path / "results") + "/",
        "dirDataset": str(tmp_path) + "/",
    })
    dataset = SCDDataset(archive, None, argument_ratio=16, partition=1.0,
                         train_subset="train16p100", test_set=4,
                         split_profile_path=cfg.dirDataSplitProfile)
    factory = NetworkFactory(cfg, dataset=dataset)
    assert factory._pipelined
    assert factory.mesh.shape == {"data": 2, "pipe": 2}
    batch = next(dataset.epoch_batches(4))
    loss, _ = factory.train(*batch)
    assert np.isfinite(float(loss))

    # geometry guards: wrong model family / stack count hard-fail
    cfg2 = Configuration()
    cfg2.update_config({**cfg.config, "modelName": "centerOffsetRes10q"})
    with pytest.raises(ValueError, match="no stack boundary"):
        NetworkFactory(cfg2, dataset=dataset)
    cfg3 = Configuration()
    cfg3.update_config({**cfg.config, "modelName": "centerOffsetHourglass"})
    with pytest.raises(ValueError, match="must equal the model's stack"):
        NetworkFactory(cfg3, dataset=dataset)
