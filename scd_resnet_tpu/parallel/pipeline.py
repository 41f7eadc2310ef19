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

    hourglass -> prediction conv -> terminal head, plus the inter-stack
    shortcut/merge (stackHourglass.py:196-229) producing the next stage's
    ``inter``. Returns ``(next_inter, head)`` with ``next_inter`` shaped
    like the input, so stages chain and parameters stack.
    """

    iterations: int = 5
    dimensions: Sequence[int] = (128, 128, 192, 192, 192, 256)
    modules: Sequence[int] = (2, 2, 2, 2, 2, 4)
    prediction_dim: int = 256
    head_features: int = 1
    head_bias: Optional[float] = -2.19
    pool_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inter, train: bool = False):
        cur_dim = self.dimensions[0]
        kp = Hourglass(self.iterations, self.dimensions, self.modules,
                       self.pool_downsample, self.dtype)(inter, train)
        cnv = ConvBlock(self.prediction_dim, 3, dtype=self.dtype)(kp, train)
        head = HourglassHead(self.head_features, cur_dim,
                             final_bias=self.head_bias, dtype=self.dtype)(cnv)

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
    Python loop on one device. Returns heads shaped (S, M, mb, h, w, c)."""
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
    return jnp.stack([jnp.stack(h) for h in heads])


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
        heads = jax.lax.dynamic_slice_in_dim(heads, stage_id, n_micro, axis=0)
        return heads[None]

    return _shard_map(
        run, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis),
    )(stacked_variables, microbatches)
