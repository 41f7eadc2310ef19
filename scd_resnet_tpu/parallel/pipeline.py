"""Pipeline parallelism over a ``pipe`` mesh axis (GPipe-style).

The natural pipeline-parallel unit of this framework is the stacked
hourglass: the reference's production default is nstack=2
(/root/reference/models/backbones/stackHourglass.py:130-272, stacks built
in a sequential loop), and each stack body — hourglass -> prediction conv
-> terminal head -> inter-stack merge — is a homogeneous repeating block
whose only inter-stack dependency is the (B, H/4, W/4, C) ``inter``
activation. That is exactly the GPipe shape: stage = stack, activations
flow stage s -> s+1, microbatches keep every stage busy.

TPU-native design (no NCCL send/recv): the stages live on a ``pipe`` mesh
axis; the schedule is a single ``lax.scan`` over ``M + S - 1`` ticks run
under ``shard_map``, with the inter-stack activation moved one stage
forward per tick by ``lax.ppermute`` over ICI. Because ``ppermute`` has a
transpose rule (the inverse permutation), ``jax.grad`` through the
pipelined forward AUTOMATICALLY yields the reverse pipeline — activations
flow forward, gradients flow backward, no hand-written backward schedule.

``HourglassPipelineStage`` makes every stage's parameter tree identical by
always materialising the inter-stack merge (the reference's last stack
simply has no merge; computing and discarding it on the final stage is the
standard homogeneous-stage trick), so stage parameters stack into one
pytree with a leading ``S`` axis that shards over ``pipe``.

Used by the driver dryrun (__graft_entry__.dryrun_multichip) and
tests/test_pipeline_parallel.py, which pin the pipelined forward AND its
parameter gradients to the plain sequential loop.

Scaling note: the production trainer scales by data parallelism (+TP for
wide kernels) — at <=50M params every model in the registry fits one v5e
chip with batch 32, so the mesh 'data' axis is the efficient axis and PP
would only add bubble overhead. This executor is the scaling path for the
regime where DP stops working: stacks deep enough that one stack ~ one
chip's HBM (8-stack hourglasses at large batch), where stage-sharding the
stacks is the only way to fit, and the microbatch schedule keeps the MXUs
busy. Expert parallelism has no counterpart here — no model family is a
mixture-of-experts (nothing to shard on an 'expert' axis).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.4.35 re-exports it; keep the experimental fallback
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from scd_resnet_tpu.models.hourglass import Hourglass, HourglassHead
from scd_resnet_tpu.models.layers import BatchNorm, ConvBlock, conv1x1
from scd_resnet_tpu.models.resnet import Residual


class HourglassPipelineStage(nn.Module):
    """One pipeline stage = one hourglass stack body.

    hourglass -> prediction conv -> terminal head(s), plus the inter-stack
    shortcut/merge (stackHourglass.py:196-229) producing the next stage's
    ``inter``. Returns ``(next_inter, head)`` with ``next_inter`` shaped
    like the input, so stages chain and parameters stack.

    ``terminals`` (name, features, bias) selects the multi-head form whose
    submodule structure matches StackHourglass's per-stack scopes
    (models/hourglass.py:186-209) — only the top-level per-stack name
    suffixes differ, which ``split_stack_variables`` remaps — so a
    production checkpoint's plain tree restructures into stage trees
    leaf-for-leaf; ``head`` is then a dict keyed by terminal name.
    """

    iterations: int = 5
    dimensions: Sequence[int] = (128, 128, 192, 192, 192, 256)
    modules: Sequence[int] = (2, 2, 2, 2, 2, 4)
    prediction_dim: int = 256
    head_features: int = 1
    head_bias: Optional[float] = -2.19
    # (name, features, final_bias) triples; None -> single anonymous head
    terminals: Optional[Sequence[Any]] = None
    pool_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inter, train: bool = False):
        cur_dim = self.dimensions[0]
        kp = Hourglass(self.iterations, self.dimensions, self.modules,
                       self.pool_downsample, self.dtype)(inter, train)
        cnv = ConvBlock(self.prediction_dim, 3, dtype=self.dtype)(kp, train)
        if self.terminals is None:
            head = HourglassHead(self.head_features, cur_dim,
                                 final_bias=self.head_bias,
                                 dtype=self.dtype)(cnv)
        else:
            head = {
                name: HourglassHead(features, cur_dim, final_bias=bias,
                                    dtype=self.dtype, name=name)(cnv)
                for name, features, bias in self.terminals
            }

        shortcut = conv1x1(cur_dim, dtype=self.dtype)(inter)
        shortcut = BatchNorm(dtype=self.dtype)(shortcut, train)
        prev = conv1x1(cur_dim, dtype=self.dtype)(cnv)
        prev = BatchNorm(dtype=self.dtype)(prev, train)
        nxt = nn.relu(shortcut + prev)
        nxt = Residual(cur_dim, dtype=self.dtype)(nxt, train)
        return nxt, head


def init_stage_stack(stage: nn.Module, rng, sample_inter, n_stages: int):
    """Init ``n_stages`` independent stage parameter trees and stack them
    along a new leading axis (the ``pipe`` axis)."""
    keys = jax.random.split(rng, n_stages)
    variables = [stage.init(k, sample_inter, False) for k in keys]
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *variables)


def sequential_apply(apply_fn, stacked_variables, microbatches):
    """Ground truth: run every microbatch through the stages in a plain
    Python loop on one device. Returns heads shaped (S, M, mb, h, w, c)
    per head leaf (heads may be pytrees — the multi-terminal stage)."""
    n_stages = jax.tree_util.tree_leaves(stacked_variables)[0].shape[0]
    per_stage = [
        jax.tree_util.tree_map(lambda a, s=s: a[s], stacked_variables)
        for s in range(n_stages)
    ]
    heads = []  # [stage][microbatch]
    for s in range(n_stages):
        heads.append([])
    for m in range(microbatches.shape[0]):
        inter = microbatches[m]
        for s in range(n_stages):
            inter, head = apply_fn(per_stage[s], inter)
            heads[s].append(head)
    stacked = [
        jax.tree_util.tree_map(lambda *hs: jnp.stack(hs), *h) for h in heads
    ]
    return jax.tree_util.tree_map(lambda *hs: jnp.stack(hs), *stacked)


def pipeline_apply(apply_fn, stacked_variables, microbatches, mesh,
                   axis: str = "pipe"):
    """GPipe forward over the mesh's ``axis``: stage s holds slice s of
    ``stacked_variables``; microbatches (M, mb, h, w, c) enter stage 0 one
    per tick and the ``inter`` activation ppermutes one stage forward per
    tick. ``M + S - 1`` ticks drain the pipe. Differentiable: ``jax.grad``
    through this yields the reverse (backward) pipeline via ppermute's
    transpose. Returns heads shaped (S, M, mb, h, w, c) — identical to
    ``sequential_apply``.
    """
    n_stages = mesh.shape[axis]
    n_micro = microbatches.shape[0]
    ticks = n_micro + n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def run(variables_local, mbs):
        variables = jax.tree_util.tree_map(lambda a: a[0], variables_local)
        stage_id = jax.lax.axis_index(axis)
        # the scan carry is device-varying (each stage holds a different
        # activation); the zeros init must carry the same varying-manual-
        # axes type or the carry types mismatch
        zeros = jnp.zeros_like(mbs[0])
        if hasattr(jax.lax, "pcast"):
            state0 = jax.lax.pcast(zeros, (axis,), to="varying")
        else:  # pragma: no cover - older jax spells it pvary
            state0 = jax.lax.pvary(zeros, (axis,))

        def tick(state, t):
            # stage 0 ingests microbatch t (clamped — the drain ticks feed
            # it a repeat whose output never lands in a valid slot); later
            # stages consume what ppermute delivered last tick
            ingest = mbs[jnp.clip(t, 0, n_micro - 1)]
            inp = jnp.where(stage_id == 0, ingest, state)
            nxt, head = apply_fn(variables, inp)
            return jax.lax.ppermute(nxt, axis, perm), head

        _, heads = jax.lax.scan(tick, state0, jnp.arange(ticks))
        # stage s's valid outputs are ticks [s, s + M)
        heads = jax.tree_util.tree_map(
            lambda h: jax.lax.dynamic_slice_in_dim(
                h, stage_id, n_micro, axis=0)[None],
            heads)
        return heads

    return _shard_map(
        run, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis),
    )(stacked_variables, microbatches)


# ---- trainer-grade pipelining of the production StackHourglass -------------
#
# The round-4 executor above proved the schedule on a synthetic homogeneous
# stage. The pieces below make it consume the PRODUCTION CenterNetHourglass
# parameter tree (models/hourglass.py StackHourglass scope names), so a
# config-reachable pipelined train step shares checkpoints with the plain
# trainer: split the plain tree into per-stage trees, stack them over the
# 'pipe' axis, run the schedule, and route gradients back through the same
# (pure, differentiable) restructuring.

STACK_TERMINALS = (("heatmap", 1, -2.19), ("regr", 4, None), ("offset", 2, None))


def _split_collection(tree, stacks: int, terminal_names: Sequence[str]):
    """One flax collection (params OR batch_stats) of a plain StackHourglass
    scope -> (preprocess subtree, [per-stage subtree]) with
    HourglassPipelineStage naming. Keys absent from the collection (heads
    have no batch_stats, 1x1 convs no BN) are skipped symmetrically.

    The last stage has no inter-stack merge in the plain tree
    (stackHourglass.py:196: the reference's final stack skips it); for
    homogeneous stacking its stage tree reuses stage-0's merge leaves —
    the schedule discards that stage's ``next_inter``, so they contribute
    zero gradient and no output.
    """
    if stacks < 2:
        raise ValueError("pipelining needs >= 2 stacks (one stack has no "
                         "inter-stack boundary to cut at)")
    pre = {k: tree[k] for k in ("ConvBlock_0", "Residual_0") if k in tree}
    stage_trees = []
    for s in range(stacks):
        last = s == stacks - 1
        st = {}

        def put(dst, src):
            if src in tree:
                st[dst] = tree[src]

        put("Hourglass_0", f"Hourglass_{s}")
        put("ConvBlock_0", f"ConvBlock_{s + 1}")
        for name in terminal_names:
            put(name, f"{name}_{s}")
        m = 0 if last else s  # merge leaves: stage-0's for the last stage
        put("Conv_0", f"Conv_{2 * m}")
        put("BatchNorm_0", f"BatchNorm_{2 * m}")
        put("Conv_1", f"Conv_{2 * m + 1}")
        put("BatchNorm_1", f"BatchNorm_{2 * m + 1}")
        put("Residual_0", f"Residual_{m + 1}")
        stage_trees.append(st)
    return pre, stage_trees


def split_stack_variables(variables, stacks: int,
                          terminal_names: Sequence[str]):
    """Plain StackHourglass-scope variables ({'params': ..,
    'batch_stats': ..}) -> (preprocess variables, stage variables stacked
    over a leading S axis). Pure jnp restructuring — differentiable, so
    ``jax.grad`` through it routes stage gradients back to the plain tree."""
    pre = {}
    stages = {}
    for coll, tree in variables.items():
        pre_c, stage_trees = _split_collection(tree, stacks, terminal_names)
        pre[coll] = pre_c
        stages[coll] = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *stage_trees)
    return pre, stages


def merge_stage_stats(plain_stats, stacked_stats, stacks: int):
    """Inverse of the batch_stats split: scatter per-stage updated BN
    statistics (leading S axis) back into a plain StackHourglass-scope
    stats tree. The last stage's merge-BN slices are DROPPED — they
    normalized the computed-and-discarded merge."""
    out = dict(plain_stats)

    def take(src_key, s, dst_key):
        node = stacked_stats
        for part in src_key:
            node = node[part]
        out[dst_key] = jax.tree_util.tree_map(lambda a: a[s], node)

    for s in range(stacks):
        take(("Hourglass_0",), s, f"Hourglass_{s}")
        take(("ConvBlock_0",), s, f"ConvBlock_{s + 1}")
        if s < stacks - 1:
            take(("BatchNorm_0",), s, f"BatchNorm_{2 * s}")
            take(("BatchNorm_1",), s, f"BatchNorm_{2 * s + 1}")
            take(("Residual_0",), s, f"Residual_{s + 1}")
    return out


def pipeline_train_apply(apply_fn, stacked_variables, microbatches, mesh,
                         axis: str = "pipe", data_axis: Optional[str] = None):
    """GPipe schedule with TRAIN-mode batch norm: ``apply_fn(variables, x)``
    must return ``((next_inter, head), mutated_batch_stats_tree)`` (flax
    ``apply(..., mutable=['batch_stats'])``). Per-microbatch BN statistics
    are threaded through the scan carry, and a stage's running stats only
    update on its valid ticks (t in [stage, stage + M)) — the drain ticks
    feed repeats whose side effects must not land.

    Returns ``(heads, new_stacked_batch_stats)`` with heads shaped like
    :func:`pipeline_apply`'s output. Microbatch-sequential BN updates are
    the standard pipeline-parallel semantics (a full-batch moment pass
    would serialize the pipe); the ground truth for tests is the same
    microbatch loop run sequentially.
    """
    n_stages = mesh.shape[axis]
    n_micro = microbatches.shape[0]
    ticks = n_micro + n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def _pvary(x, axes):
        if not axes:
            return x
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axes, to="varying")
        return jax.lax.pvary(x, axes)  # pragma: no cover - older jax

    def run(variables_local, mbs):
        variables = jax.tree_util.tree_map(lambda a: a[0], variables_local)
        params = variables["params"]
        # the scan carry becomes device-varying after the first masked
        # update (stage- and data-shard-local values) — pin the carry types
        # up front. bstats arrive pipe-varying (in_spec P(axis)) and mbs
        # data-varying, so each only needs the missing axes added.
        data_axes = (data_axis,) if data_axis else ()
        bstats0 = jax.tree_util.tree_map(
            lambda a: _pvary(a, data_axes), variables["batch_stats"])
        stage_id = jax.lax.axis_index(axis)
        state0 = _pvary(jnp.zeros_like(mbs[0]), (axis,))

        def tick(carry, t):
            state, bstats = carry
            ingest = mbs[jnp.clip(t, 0, n_micro - 1)]
            inp = jnp.where(stage_id == 0, ingest, state)
            (nxt, head), mutated = apply_fn(
                {"params": params, "batch_stats": bstats}, inp)
            valid = (t >= stage_id) & (t < stage_id + n_micro)
            new_bstats = jax.tree_util.tree_map(
                lambda new, old: jnp.where(valid, new, old),
                mutated["batch_stats"], bstats)
            return (jax.lax.ppermute(nxt, axis, perm), new_bstats), head

        (_, bstats_final), heads = jax.lax.scan(
            tick, (state0, bstats0), jnp.arange(ticks))
        heads = jax.tree_util.tree_map(
            lambda h: jax.lax.dynamic_slice_in_dim(
                h, stage_id, n_micro, axis=0)[None],
            heads)
        if data_axis is not None:
            # normalization used shard-local moments (plain DDP-without-
            # SyncBN semantics); the RUNNING stats checkpoint as the
            # cross-shard mean so they are well-defined per stage
            bstats_final = jax.tree_util.tree_map(
                lambda a: jax.lax.pmean(a, data_axis), bstats_final)
        bstats_final = jax.tree_util.tree_map(
            lambda a: a[None], bstats_final)
        return heads, bstats_final

    mb_spec = P(None, data_axis) if data_axis else P()
    heads_spec = P(axis, None, data_axis) if data_axis else P(axis)
    return _shard_map(
        run, mesh=mesh, in_specs=(P(axis), mb_spec),
        out_specs=(heads_spec, P(axis)),
    )(stacked_variables, microbatches)


def make_pipelined_stack_forward(mesh, stacks: int, n_micro: int, *,
                                 iterations: int, dimensions: Sequence[int],
                                 modules: Sequence[int], prediction_dim: int,
                                 terminals: Sequence[Any],
                                 dtype: Any = jnp.float32,
                                 remat: bool = False,
                                 axis: str = "pipe",
                                 scope: str = "StackHourglass_0"):
    """A drop-in replacement for the plain CenterNetHourglass training
    forward, computed as a GPipe pipeline over the mesh's ``axis``.

    Returns ``forward(params, batch_stats, xs) -> (outs, {'batch_stats':
    new})`` with the SAME plain parameter tree and per-stack output list as
    ``model.apply(..., train=True, mutable=['batch_stats'])`` — so the
    factory's step core, optimizer, checkpointing, and validation are
    untouched; only activation flow changes. Preprocess (Conv7/s2 +
    Residual/s2) runs under the outer jit (GSPMD shards it over 'data');
    the stacks run in the microbatch schedule with per-microbatch BN
    updates (see :func:`pipeline_train_apply`).
    """
    names = tuple(t[0] for t in terminals)
    stage = HourglassPipelineStage(
        iterations=iterations, dimensions=tuple(dimensions),
        modules=tuple(modules), prediction_dim=prediction_dim,
        terminals=tuple(terminals), pool_downsample=False, dtype=dtype)
    data_axis = (
        "data" if "data" in mesh.axis_names and mesh.shape["data"] > 1
        else None
    )

    def apply_train(vs, x):
        return stage.apply(vs, x, True, mutable=["batch_stats"])

    if remat:
        apply_train = jax.checkpoint(apply_train)

    def forward(params, batch_stats, xs):
        plain_p = params[scope]
        plain_b = batch_stats[scope]
        pre, stages = split_stack_variables(
            {"params": plain_p, "batch_stats": plain_b}, stacks, names)
        inter, mut0 = ConvBlock(128, 7, stride=2, dtype=dtype).apply(
            {"params": pre["params"]["ConvBlock_0"],
             "batch_stats": pre["batch_stats"]["ConvBlock_0"]},
            xs, True, mutable=["batch_stats"])
        inter, mut1 = Residual(dimensions[0], stride=2, dtype=dtype).apply(
            {"params": pre["params"]["Residual_0"],
             "batch_stats": pre["batch_stats"]["Residual_0"]},
            inter, True, mutable=["batch_stats"])
        mb = inter.shape[0] // n_micro
        mbs = inter.reshape((n_micro, mb) + inter.shape[1:])
        heads, new_stage_stats = pipeline_train_apply(
            apply_train, stages, mbs, mesh, axis, data_axis)
        outs = [
            jax.tree_util.tree_map(
                lambda h, s=s: h[s].reshape((-1,) + h.shape[3:]), heads)
            for s in range(stacks)
        ]
        new_plain_b = merge_stage_stats(plain_b, new_stage_stats, stacks)
        new_plain_b["ConvBlock_0"] = mut0["batch_stats"]
        new_plain_b["Residual_0"] = mut1["batch_stats"]
        return outs, {"batch_stats": {scope: new_plain_b}}

    return forward
