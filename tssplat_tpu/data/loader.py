"""View-batch dataloader: whole dataset device-resident, per-iteration batch
index lists precomputed and split by (world_size, rank).

Capability parity with the reference loader (reference:
data/dataloader.py:13-163), including its exact semantics:
  - GT RGB composited over the background by alpha before training
    (``lerp(bg, rgb, a)``, dataloader.py:49-50);
  - per-iteration reshuffle of the full view list with the module-level RNG
    seeded once at 1234 (dataloader.py:86-97) — deterministic batch order;
  - rank slice ``[rank*bs : min((rank+1)*bs, n)]`` of each iteration's
    shuffle (dataloader.py:99-106). The reference reuses the same slice for
    every forward of an iteration; reproduced as-is;
  - ``num_forward_per_iter = ceil(n / (bs * world_size))``.

On TPU the (world_size, rank) seam becomes real data parallelism: the
train step shards the batch across the device mesh (tssplat_tpu.parallel),
with every host able to materialize any rank's slice deterministically.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import parse_structured, DATALOADERS
from .datasets import (MitsubaImgDataset, BlenderImgDataset,
                       Wonder3DImgDataset, ArrayDataset)


class ViewDataLoader:
    @dataclass
    class Config:
        batch_size: int = 1
        total_num_iter: int = 1
        world_size: int = 1
        rank: int = 0
        dataset_config: Optional[dict] = None

    dataset_cls = None

    def __init__(self, cfg=None, dataset=None):
        self.cfg = parse_structured(self.Config, cfg)
        if dataset is None:
            if self.dataset_cls is None:
                raise ValueError("no dataset class / instance given")
            dataset = self.dataset_cls(self.cfg.dataset_config)
        self.dataset = dataset
        self.prepare_data()

    def __len__(self):
        return len(self.dataset)

    # -- device upload (reference to_torch, dataloader.py:31-63) -------------
    def _to_device(self):
        ds = self.dataset
        img = jnp.asarray(np.stack(ds.all_tgt_imgs), jnp.float32)
        bg = jnp.asarray(np.stack(ds.bgs), jnp.float32)
        # composite GT over background by alpha, keep alpha channel
        rgb = bg + (img[..., 0:3] - bg) * img[..., 3:4]
        img = jnp.concatenate([rgb, img[..., 3:4]], axis=-1)
        self.data_all = {
            "mv": jnp.asarray(np.stack(ds.all_mv_mats), jnp.float32),
            "mvp": jnp.asarray(np.stack(ds.all_mvp_mats), jnp.float32),
            "campos": jnp.asarray(np.stack(ds.all_campos), jnp.float32),
            "resolution": ds.resolution,
            "spp": ds.spp,
            "img": img,
            "n": jnp.asarray(np.stack(ds.all_tgt_ns), jnp.float32),
            "d": jnp.asarray(np.stack(ds.all_tgt_ds), jnp.float32),
            "background": bg,
        }

    def prepare_data(self):
        self._to_device()
        n = len(self.dataset)
        c = self.cfg
        per_iter = c.batch_size * c.world_size
        self.num_forward_per_iter = n // per_iter + (1 if n % per_iter else 0)

        rng = random.Random()
        rng.seed(1234)
        # reference shuffles an appended index list once after seeding
        # (dataloader.py:83-90); replayed to keep the RNG stream identical
        appended = self.num_forward_per_iter * per_iter * c.total_num_iter
        warmup = [i % n for i in range(appended)]
        rng.shuffle(warmup)

        self.batch_list = []
        for _ in range(c.total_num_iter):
            index_list = list(range(n))
            rng.shuffle(index_list)
            batch_iter = []
            for _fw in range(self.num_forward_per_iter):
                per_rank = []
                for rank_i in range(c.world_size):
                    start = rank_i * c.batch_size
                    end = min(start + c.batch_size, n)
                    per_rank.append(index_list[start:end])
                batch_iter.append(per_rank)
            self.batch_list.append(batch_iter)

    def batch_indices(self, it: int, forward_id: int,
                      rank: Optional[int] = None) -> np.ndarray:
        r = self.cfg.rank if rank is None else rank
        return np.asarray(self.batch_list[it][forward_id][r], np.int32)

    def __call__(self, it: int, forward_id: int, rank: Optional[int] = None):
        ids = self.batch_indices(it, forward_id, rank)
        d = self.data_all
        return {
            "mv": d["mv"][ids],
            "mvp": d["mvp"][ids],
            "campos": d["campos"][ids],
            "resolution": d["resolution"],
            "spp": d["spp"],
            "img": d["img"][ids],
            "background": d["background"][ids],
            "n": d["n"][ids],
            "d": d["d"][ids],
            # dataset-view indices of this batch: per-view precomputed
            # caches (frozen-geometry texture stage) index by these
            "view_idx": jnp.asarray(ids, jnp.int32),
        }


@DATALOADERS.register("MistubaImgDataLoader")      # sic — reference name
@DATALOADERS.register("MitsubaImgDataLoader")
class MitsubaImgDataLoader(ViewDataLoader):
    dataset_cls = MitsubaImgDataset


@DATALOADERS.register("BlenderImgDataLoader")
class BlenderImgDataLoader(ViewDataLoader):
    dataset_cls = BlenderImgDataset


@DATALOADERS.register("Wonder3DDataLoader")
class Wonder3DDataLoader(ViewDataLoader):
    dataset_cls = Wonder3DImgDataset


@DATALOADERS.register("ArrayDataLoader")
class ArrayDataLoader(ViewDataLoader):
    """Loader over an in-memory ArrayDataset (synthetic targets, tests)."""
    dataset_cls = ArrayDataset

    def __init__(self, cfg=None, dataset=None, **arrays):
        if dataset is None and arrays:
            dataset = ArrayDataset(**arrays)
        super().__init__(cfg, dataset=dataset)
