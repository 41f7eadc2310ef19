"""SCD training dataset over a `.d` archive.

One parameterized class replaces the reference's 26 near-identical
``datasets/scds/scdx{A}p{P}.py`` files (590 lines each, differing only in
``ARGUMENTRATIO`` / ``PARTITION`` / ``TRAINSUBSET`` — scdx1p5.py:57-60 vs
scdx16p100.py:57-60). The named variants live in the dataset registry
(scd_resnet_tpu.train.registry).

Faithful behaviors (scdx16p100.py):

- intake order filtered by rotation-augment index < ``argument_ratio``,
  then shuffled and truncated by ``partition`` (144-161);
- fixed-size validation split persisted/consumed as the
  ``{dataset}.split.json`` profile with the same schema (163-186, 288-290);
- validation set pre-rendered once (heatmaps at IoU 0.5, normalized
  samples) and chunked by ``validationBatchSize`` (199-286, 381-414);
- epoch reshuffle of the training order (305-310) — but keyed per epoch,
  not a side effect of ``__getitem__(0)`` (the reference's racy pattern,
  SURVEY.md defect #7);
- MAXTAGLEN=30 fixed-shape packing (328-351).

Deliberately different: samples live in one contiguous host array and
augmentation/label-render runs fused on device per batch
(data/pipeline.py), not per sample on host.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from scd_resnet_tpu.core.logging import Logger
from scd_resnet_tpu.data.archive import MAXTAGLEN, read_archive
from scd_resnet_tpu.data.pipeline import augment_and_render_batch

_NAME_RE = re.compile(r"^(?P<img>.+?)\.(?P<rep>\d+)\.(?P<clip>\d+)\.npy$")


class SCDDataset:
    """In-memory dataset with device-side augmentation.

    Args:
      zip_path: `.d` archive path.
      data_split: parsed split-profile dict (same schema as the reference's
        ``{dataset}.split.json``) or None to create a fresh split.
      argument_ratio: keep clips whose rotation-augment index < this
        (ARGUMENTRATIO).
      partition: fraction of the (shuffled) intake order kept (PARTITION).
      train_subset: name of the training subset inside the split profile
        (TRAINSUBSET, e.g. 'train16p100').
      test_set: validation clip count (TESTSET=5760 in the reference);
        capped to half the data for small archives.
      heat_size: heatmap side; S//4 for S-sized clips.
      split_profile_path: where to persist the split profile (optional).
      seed: shuffling seed.
    """

    def __init__(self, zip_path: str, data_split: Optional[Dict] = None, *,
                 argument_ratio: int = 16, partition: float = 1.0,
                 train_subset: str = "train16p100", test_set: int = 5760,
                 heat_size: Optional[int] = None,
                 split_profile_path: Optional[str] = None, seed: int = 42,
                 storage_dtype: str = "float32"):
        Logger.log("Loading archive {} ...".format(zip_path))
        self.names, self.samples, self.locs, self.counts = read_archive(zip_path)
        # compact in-memory storage: halves/quarters both host RAM and the
        # per-batch host->device payload in streaming mode (the on-device
        # pipeline casts back to float32 before augmentation)
        if storage_dtype == "float16":
            self.samples = self.samples.astype(np.float16)
        elif storage_dtype == "uint8":
            self.samples = np.clip(np.rint(self.samples), 0, 255).astype(
                np.uint8)
        self.storage_dtype = storage_dtype
        if self.samples.ndim != 3 or len(self.names) == 0:
            raise ValueError("empty or malformed archive: {}".format(zip_path))
        size = self.samples.shape[1]
        self.heat_size = heat_size or size // 4
        self.train_subset = train_subset
        rng = np.random.default_rng(seed)

        # intake order: keep augment reps < argument_ratio (scdx16p100.py:148-157)
        order: List[int] = []
        for raw_index, name in enumerate(self.names):
            match = _NAME_RE.match(name)
            rep = int(match.group("rep")) if match else 0
            if rep < argument_ratio:
                order.append(raw_index)

        rng.shuffle(order)
        order = order[: int(len(order) * partition)]

        self.data_profile: Dict[str, List[int]] = {"validation": []}
        if data_split is None:
            Logger.log(
                "No data split profile; selecting a fresh validation set."
            )
            rng.shuffle(order)
            num_validation = min(int(round(test_set)), max(1, len(order) // 2))
            self.data_profile["validation"] = order[:num_validation]
            order = order[num_validation:]
            self.data_profile[train_subset] = order
        else:
            Logger.log("Extracting validation set from data split profile ...")
            self.data_profile = dict(data_split)
            if train_subset in self.data_profile:
                order = list(self.data_profile[train_subset])
            else:
                validation = set(self.data_profile["validation"])
                order = [x for x in order if x not in validation]
                self.data_profile[train_subset] = order

        self.order = list(order)
        if split_profile_path:
            with open(split_profile_path, "w") as f:
                json.dump(self.data_profile, f)

        self._rng = rng
        self._seed = seed
        self._build_validation()
        Logger.log(
            "Dataset ready: {} training / {} validation clips".format(
                len(self.order), len(self.data_profile["validation"])
            )
        )

    # ---- validation ------------------------------------------------------

    def _build_validation(self) -> None:
        self._validation_cache: Dict[bool, Dict] = {}

    def _render_validation(self, corner_targets: bool) -> Optional[Dict]:
        """Pre-render the validation set once per target family
        (scdx16p100.py:199-286), no augmentation."""
        if corner_targets in self._validation_cache:
            return self._validation_cache[corner_targets]
        val_ids = np.asarray(self.data_profile["validation"], np.int64)
        if len(val_ids) == 0:
            return None
        # render in fixed-size device chunks and keep the results on HOST:
        # one jitted call over the production 5760-clip set would allocate
        # several GB of inputs plus the (N, K, H, W) Gaussian broadcast in
        # HBM, and the pre-rendered set only needs to stream back per
        # validation batch anyway
        chunk = 256
        pad = (-len(val_ids)) % chunk
        padded_ids = np.concatenate([val_ids, val_ids[: 1].repeat(pad)])
        xs_parts, ys_parts = [], None
        for start in range(0, len(padded_ids), chunk):
            ids = padded_ids[start:start + chunk]
            cx, cy = augment_and_render_batch(
                jax.random.PRNGKey(0), self.samples[ids], self.locs[ids],
                self.counts[ids], self.heat_size,
                augment=False, corner_targets=corner_targets,
            )
            xs_parts.append(np.asarray(cx))
            host_ys = [np.asarray(y) for y in cy]
            if ys_parts is None:
                ys_parts = [[y] for y in host_ys]
            else:
                for acc, y in zip(ys_parts, host_ys):
                    acc.append(y)
        total = len(val_ids)
        xs = np.concatenate(xs_parts)[:total]
        ys = [np.concatenate(parts)[:total] for parts in ys_parts]
        samples = self.samples[val_ids]
        locs = self.locs[val_ids]
        counts = self.counts[val_ids]
        if corner_targets:
            # corner-family layout: [heat, mask, regr, inds, tl, br]
            packed = {"xs": [xs], "ys": list(ys)}
        else:
            # center-family layout: ys[3] carries the full float loc records
            # for the [It] metric path (the reference's getValidationSet
            # passes fixedLocs there, scdx16p100.py:404-414 +
            # centerNetEvaluation:287-292), ys[4] the object counts, ys[5]
            # the integer indices.
            packed = {
                "xs": [xs],
                "ys": [ys[0], ys[1], ys[2], np.asarray(locs, np.float32),
                       np.asarray(counts), ys[3]],
            }
        self._validation_cache[corner_targets] = packed
        return packed

    def get_validation_set(self, validation_batch_size: int,
                           corner_targets: bool = False) -> List[Dict]:
        """Chunk the pre-rendered validation set (scdx16p100.py:381-414)."""
        validation = self._render_validation(corner_targets)
        if validation is None:
            return []
        total = int(validation["xs"][0].shape[0])
        if total <= validation_batch_size:
            return [validation]
        batches = []
        for k in range(total // validation_batch_size):
            sl = slice(k * validation_batch_size, (k + 1) * validation_batch_size)
            batches.append(
                {
                    "xs": [validation["xs"][0][sl]],
                    "ys": [y[sl] for y in validation["ys"]],
                }
            )
        return batches

    # ---- training --------------------------------------------------------

    def __len__(self) -> int:
        return len(self.order)

    def _epoch_order(self, epoch: Optional[int]) -> np.ndarray:
        """The shuffled train order for one epoch.

        ``epoch`` keyed (seed, epoch): deterministic per epoch number, so
        a resumed run replays exactly the epochs it would have seen —
        NOT a stateful stream that restarts from epoch 1 on resume. With
        ``epoch=None`` falls back to the legacy in-place stateful
        shuffle."""
        if epoch is None:
            self._rng.shuffle(self.order)
            return np.asarray(self.order)
        rng = np.random.default_rng((self._seed, 7919, int(epoch)))
        order = np.asarray(self.order)
        return order[rng.permutation(len(order))]

    def steps_per_epoch(self, batch_size: int, shard_count: int = 1,
                        shard_index: int = 0) -> int:
        """Batches one epoch yields per host (drop_last).

        Computed from the SMALLEST host shard so every host agrees on
        the epoch length — per-host counts would let hosts advance to
        different epoch permutations when the order does not split
        evenly (duplicating/omitting clips across the data-parallel
        group) and would let one host raise while the others hang in
        collectives."""
        del shard_index  # same answer on every host by construction
        return (len(self.order) // shard_count) // batch_size

    def epoch_batches(self, batch_size: int, shard_count: int = 1,
                      shard_index: int = 0, epoch: Optional[int] = None,
                      skip: int = 0
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """One epoch of raw (samples, locs, counts) batches, drop_last.

        ``shard_count``/``shard_index`` give per-host sharding of the epoch
        order — the DistributedSampler equivalent (networkFactory.py:106-108)
        for multi-host training; within a host the global batch is sharded
        across devices by the train step's input shardings. Every host
        yields exactly :meth:`steps_per_epoch` batches. ``skip`` starts
        ``skip`` batches into the epoch (resume fast-forward) without
        materializing the skipped batches.
        """
        order = self._epoch_order(epoch)[shard_index::shard_count]
        n_steps = self.steps_per_epoch(batch_size, shard_count)
        for start in range(skip * batch_size, n_steps * batch_size,
                           batch_size):
            idx = order[start : start + batch_size]
            yield self.samples[idx], self.locs[idx], self.counts[idx]

    # ---- device-resident mode ---------------------------------------------

    def device_shards(self, num_shards: int):
        """Partition the TRAINING rows across ``num_shards`` devices for
        HBM residency (validation stays on host and streams).

        Returns ``(shard_rows, local_train)``: ``shard_rows[d]`` is the
        global row ids resident on device d (equal-length; at most
        ``num_shards - 1`` tail rows of the shuffled train order are
        dropped, the drop_last analog) and ``local_train[d]`` the LOCAL
        indices (the full shard). Each device samples its own shard — the
        DistributedSampler per-rank-subset semantics with zero per-step
        host->device payload beyond the index vector."""
        order = np.asarray(self.order)
        per = len(order) // num_shards
        shard_rows = [order[d * per:(d + 1) * per] for d in range(num_shards)]
        local_train = [np.arange(per) for _ in range(num_shards)]
        return shard_rows, local_train

    def steps_per_epoch_resident(self, batch_size: int, num_shards: int,
                                 local_train) -> int:
        per_dev = batch_size // num_shards
        return min(len(t) for t in local_train) // per_dev

    def epoch_local_indices(self, batch_size: int, num_shards: int,
                            local_train, epoch: Optional[int] = None,
                            skip: int = 0) -> Iterator[np.ndarray]:
        """One epoch of per-device LOCAL index batches, (num_shards *
        batch_size/num_shards,) concatenated device-major, drop_last.
        ``epoch`` selects a deterministic per-epoch shuffle (see
        :meth:`_epoch_order`); ``None`` keeps the legacy stateful one.
        ``skip`` starts mid-epoch (resume fast-forward)."""
        per_dev = batch_size // num_shards
        orders = []
        for d in range(num_shards):
            arr = local_train[d].copy()
            if epoch is None:
                self._rng.shuffle(arr)
            else:
                rng = np.random.default_rng(
                    (self._seed, 104729, int(epoch), d))
                arr = arr[rng.permutation(len(arr))]
            orders.append(arr)
        steps = min(len(o) for o in orders) // per_dev
        for s in range(skip, steps):
            yield np.concatenate(
                [o[s * per_dev : (s + 1) * per_dev] for o in orders]
            ).astype(np.int32)
