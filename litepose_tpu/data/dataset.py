"""Datasets and input pipeline (host side).

COCO / CrowdPose keypoint datasets over the self-contained annotation index
(no pycocotools), producing per-scale heatmap/mask/joint targets like the
reference datasets (``/root/reference/lib/dataset/COCOKeypoints.py:63-93``,
``CrowdPoseKeypoints.py``), plus:

  * a deterministic per-item RNG (seed, epoch, index) instead of global
    random state — reproducible and multi-host-shardable;
  * ``make_batch_iterator`` which shards the index across JAX processes
    (replacing DistributedSampler, ``/root/reference/lib/dataset/build.py:61-90``)
    and prefetches batches on a background thread;
  * results conversion + OKS evaluation (replacing
    ``COCODataset.evaluate``, ``/root/reference/lib/dataset/COCODataset.py:159-309``).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .coco_io import CocoAnnotations
from .eval_oks import KeypointEvaluator
from .flip import flip_index_for
from .targets import HeatmapGenerator, JointsGenerator, ScaleAwareHeatmapGenerator
from .transforms import TrainTransform


def _load_image(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class PoseDataset:
    """COCO-format keypoints dataset (train or eval).

    Args:
      ann_file: annotation JSON (COCO format; CrowdPose uses the same).
      image_dir: directory with image files.
      num_joints: 17 (COCO) / 14 (CrowdPose) (+1 with center).
      style: 'coco' | 'crowdpose' (controls eval sigmas + buckets).
    """

    def __init__(
        self,
        ann_file: str,
        image_dir: str,
        num_joints: int,
        style: str = "coco",
        with_center: bool = False,
        remove_images_without_annotations: bool = True,
        filter_for_train: bool = True,
    ):
        self.coco = CocoAnnotations(ann_file)
        self.image_dir = image_dir
        self.num_joints = num_joints
        self.with_center = with_center
        self.num_joints_without_center = num_joints - 1 if with_center else num_joints
        self.style = style
        self.ids = self.coco.image_ids
        if remove_images_without_annotations and filter_for_train:
            self.ids = [i for i in self.ids if self.coco.annotations_for(i)]

    def __len__(self) -> int:
        return len(self.ids)

    def image_path(self, image_id: int) -> str:
        return os.path.join(self.image_dir, self.coco.image_info(image_id)["file_name"])

    def load_raw(self, idx: int):
        """(image RGB u8, annotations, image_id)"""
        image_id = self.ids[idx]
        return _load_image(self.image_path(image_id)), self.coco.annotations_for(image_id), image_id

    def image_size(self, idx: int) -> tuple:
        """Source (height, width) from annotation metadata — no pixel IO.
        Lets batched eval bucket the whole split by warped shape up front
        (``PoseEngine.process_indexed``)."""
        info = self.coco.image_info(self.ids[idx])
        return (info["height"], info["width"])

    def get_joints(self, anno: List[dict], scale_aware_sigma=False,
                   base_size=256.0, base_sigma=2.0, int_sigma=False) -> np.ndarray:
        width = 4 if scale_aware_sigma else 3
        joints = np.zeros((len(anno), self.num_joints, width))
        for i, obj in enumerate(anno):
            joints[i, : self.num_joints_without_center, :3] = np.array(
                obj["keypoints"]
            ).reshape(-1, 3)
            if self.with_center:
                vis = joints[i, :-1, 2] > 0
                if vis.any():
                    joints[i, -1, :2] = joints[i, :-1, :2][vis].mean(axis=0)
                    joints[i, -1, 2] = 1
            if scale_aware_sigma:
                box = obj["bbox"]
                sigma = max(box[2], box[3]) / base_size * base_sigma
                if int_sigma:
                    sigma = int(np.round(sigma + 0.5))
                joints[i, :, 3] = sigma
        return joints

    # -- evaluation ---------------------------------------------------------

    def to_coco_results(self, preds: List[List[np.ndarray]], scores: List[List[float]]):
        """Convert (image x person x (K, >=3)) predictions to COCO results
        records (reference conversion, COCODataset.py:176-291)."""
        results = []
        for idx, people in enumerate(preds):
            image_id = self.ids[idx]
            for pid, person in enumerate(people):
                kp = np.asarray(person)[: self.num_joints_without_center, :3]
                results.append(
                    {
                        "image_id": int(image_id),
                        "category_id": 1,
                        "keypoints": [float(v) for v in kp.reshape(-1)],
                        "score": float(scores[idx][pid]),
                    }
                )
        return results

    def evaluate(self, preds, scores, output_dir: Optional[str] = None) -> Dict[str, float]:
        results = self.to_coco_results(preds, scores)
        if output_dir:
            import json

            os.makedirs(output_dir, exist_ok=True)
            with open(os.path.join(output_dir, "keypoint_results.json"), "w") as f:
                json.dump(results, f)
        evaluator = KeypointEvaluator(self.coco, style=self.style)
        return evaluator.evaluate(results)


class TrainPipeline:
    """Augmentation + target generation over a PoseDataset."""

    def __init__(self, dataset: PoseDataset, cfg, seed: int = 0):
        self.ds = dataset
        self.cfg = cfg
        self.seed = seed
        d = cfg.DATASET
        self.input_size = d.INPUT_SIZE
        self.output_sizes = list(d.OUTPUT_SIZE)
        self.scale_aware_sigma = d.SCALE_AWARE_SIGMA
        self.base_size = d.BASE_SIZE
        self.base_sigma = d.BASE_SIGMA
        self.int_sigma = d.INT_SIGMA
        style = "coco" if "coco" in d.DATASET else "crowd_pose"
        self.transform = TrainTransform(
            input_size=self.input_size,
            output_sizes=self.output_sizes,
            max_rotation=d.MAX_ROTATION,
            min_scale=d.MIN_SCALE,
            max_scale=d.MAX_SCALE,
            scale_type=d.SCALE_TYPE,
            max_translate=d.MAX_TRANSLATE,
            flip_prob=d.FLIP,
            flip_index=flip_index_for(style, d.WITH_CENTER),
            scale_aware_sigma=d.SCALE_AWARE_SIGMA,
        )
        gen = ScaleAwareHeatmapGenerator if d.SCALE_AWARE_SIGMA else HeatmapGenerator
        self.heatmap_gens = [
            gen(res, d.NUM_JOINTS) if d.SCALE_AWARE_SIGMA else gen(res, d.NUM_JOINTS, d.SIGMA)
            for res in self.output_sizes
        ]
        self.joints_gens = [
            JointsGenerator(d.MAX_NUM_PEOPLE, d.NUM_JOINTS, res, cfg.MODEL.TAG_PER_JOINT)
            for res in self.output_sizes
        ]

    def __len__(self):
        return len(self.ds)

    def get(self, idx: int, epoch: int = 0):
        rng = np.random.default_rng((self.seed, epoch, idx))
        img, anno, image_id = self.ds.load_raw(idx)
        mask = self.ds.coco.ignore_mask(image_id).astype(np.float64)
        anno = [o for o in anno if o.get("iscrowd", 0) == 0 or o.get("num_keypoints", 0) > 0]
        joints = self.ds.get_joints(
            anno, self.scale_aware_sigma, self.base_size, self.base_sigma, self.int_sigma
        )
        n_scales = len(self.output_sizes)
        masks = [mask.copy() for _ in range(n_scales)]
        joints_l = [joints.copy() for _ in range(n_scales)]
        img, masks, joints_l = self.transform(img, masks, joints_l, rng)
        heatmaps, joint_idx = [], []
        for s in range(n_scales):
            heatmaps.append(self.heatmap_gens[s](joints_l[s]).astype(np.float32))
            joint_idx.append(self.joints_gens[s](joints_l[s]).astype(np.int32))
            masks[s] = masks[s].astype(np.float32)
        return img, heatmaps, masks, joint_idx


def make_batch_iterator(
    pipeline: TrainPipeline,
    batch_size: int,
    epoch: int,
    shuffle: bool = True,
    process_index: int = 0,
    process_count: int = 1,
    drop_last: bool = True,
    prefetch: int = 2,
    num_workers: int = 4,
):
    """Host-sharded, prefetching batch iterator.

    Yields dicts of stacked numpy arrays: images (B,H,W,3) u8; per-scale
    heatmaps (B,K,R,R), masks (B,R,R), joints (B,P,K,2).
    ``num_workers`` threads decode/augment items in parallel (cv2 releases
    the GIL), replacing the reference's torch DataLoader worker processes.
    """
    from concurrent.futures import ThreadPoolExecutor

    n = len(pipeline)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng((pipeline.seed, epoch)).shuffle(order)
    # shard across hosts (replaces DistributedSampler).  Every host MUST
    # yield the same number of batches or the SPMD step deadlocks: truncate
    # the global order to a multiple of (process_count * batch_size) first
    # when dropping remainders, so shards are exactly equal.
    if drop_last:
        per_shard = n // process_count // batch_size * batch_size
        order = order[: per_shard * process_count]
    order = order[process_index::process_count]
    if drop_last:
        order = order[: len(order) // batch_size * batch_size]

    pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))

    def produce(q: queue.Queue):
        batch = []
        for item in pool.map(lambda i: pipeline.get(int(i), epoch), order):
            batch.append(item)
            if len(batch) == batch_size:
                imgs = np.stack([b[0] for b in batch])
                n_scales = len(batch[0][1])
                out = {
                    "images": imgs,
                    "heatmaps": [np.stack([b[1][s] for b in batch]) for s in range(n_scales)],
                    "masks": [np.stack([b[2][s] for b in batch]) for s in range(n_scales)],
                    "joints": [np.stack([b[3][s] for b in batch]) for s in range(n_scales)],
                }
                q.put(out)
                batch = []
        q.put(None)

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    t = threading.Thread(target=produce, args=(q,), daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            return
        yield item
