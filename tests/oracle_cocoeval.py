"""Test-only oracle: the canonical COCOeval keypoint-AP algorithm.

A faithful pure-numpy transcription of the pycocotools ``COCOeval``
keypoint path (computeOks / evaluateImg / accumulate / summarize), used to
validate ``litepose_tpu.data.eval_oks.KeypointEvaluator`` — the reference
gets its published numbers through this exact algorithm
(``/root/reference/lib/dataset/COCODataset.py:295-309``).

Input format mirrors what pycocotools sees after COCO.loadRes:
  gts: per image, list of dicts {keypoints (3K flat), area, bbox, iscrowd,
       num_keypoints}
  dts: per image, list of dicts {keypoints (3K flat), score}
Detection area/bbox are derived from the keypoint extent exactly as
COCO.loadRes does for keypoint results.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class OracleParams:
    def __init__(self, sigmas: np.ndarray, max_dets: int = 20):
        self.iouThrs = np.linspace(0.5, 0.95, 10)
        self.recThrs = np.linspace(0.0, 1.0, 101)
        self.maxDets = max_dets
        self.areaRng = {
            "all": (0.0, 1e5**2),
            "medium": (32.0**2, 96.0**2),
            "large": (96.0**2, 1e5**2),
        }
        self.sigmas = np.asarray(sigmas, np.float64)


def _load_res_fields(dt: dict, k: int) -> dict:
    """COCO.loadRes keypoint-result post-processing: derive bbox/area from
    the keypoint extent (all keypoints, regardless of visibility)."""
    kp = np.asarray(dt["keypoints"], np.float64)
    x, y = kp[0::3], kp[1::3]
    x0, x1, y0, y1 = x.min(), x.max(), y.min(), y.max()
    out = dict(dt)
    out["area"] = (x1 - x0) * (y1 - y0)
    out["bbox"] = [x0, y0, x1 - x0, y1 - y0]
    return out


def _compute_oks(dts: List[dict], gts: List[dict], p: OracleParams) -> np.ndarray:
    """computeOks: rows = dts (score-sorted, truncated), cols = gts."""
    ious = np.zeros((len(dts), len(gts)))
    if not dts or not gts:
        return ious
    vars_ = (p.sigmas * 2) ** 2
    k = len(p.sigmas)
    for j, gt in enumerate(gts):
        g = np.asarray(gt["keypoints"], np.float64)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = np.count_nonzero(vg > 0)
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = np.asarray(dt["keypoints"], np.float64)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
            else:
                z = np.zeros(k)
                dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
                dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
            e = (dx**2 + dy**2) / vars_ / (gt["area"] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def _evaluate_img(
    gts: List[dict], dts: List[dict], a_rng: Tuple[float, float], p: OracleParams
) -> Optional[dict]:
    if not gts and not dts:
        return None
    gts = [dict(g) for g in gts]
    for g in gts:
        ignore = bool(g.get("iscrowd", 0)) or g.get("num_keypoints", 0) == 0
        g["_ignore"] = 1 if (ignore or g["area"] < a_rng[0] or g["area"] > a_rng[1]) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[: p.maxDets]]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts]

    ious = _compute_oks(dts, gts, p)

    T, G, D = len(p.iouThrs), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gtIg = np.array([g["_ignore"] for g in gts])
    dtIg = np.zeros((T, D))
    if ious.size:
        for tind, t in enumerate(p.iouThrs):
            for dind in range(D):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dtIg[tind, dind] = gtIg[m]
                dtm[tind, dind] = m + 1
                gtm[tind, m] = dind + 1
    a = np.array(
        [d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dts]
    ).reshape((1, D))
    dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtIgnore": dtIg,
        "gtIgnore": gtIg,
        "dtScores": np.array([d["score"] for d in dts]),
    }


def _accumulate(evals: List[Optional[dict]], p: OracleParams) -> dict:
    T, R = len(p.iouThrs), len(p.recThrs)
    precision = -np.ones((T, R))
    recall = -np.ones((T,))
    E = [e for e in evals if e is not None]
    if not E:
        return {"precision": precision, "recall": recall}
    dtScores = np.concatenate([e["dtScores"] for e in E])
    inds = np.argsort(-dtScores, kind="mergesort")
    dtm = np.concatenate([e["dtMatches"] for e in E], axis=1)[:, inds]
    dtIg = np.concatenate([e["dtIgnore"] for e in E], axis=1)[:, inds]
    gtIg = np.concatenate([e["gtIgnore"] for e in E])
    npig = np.count_nonzero(gtIg == 0)
    if npig == 0:
        return {"precision": precision, "recall": recall}
    tps = np.logical_and(dtm, np.logical_not(dtIg))
    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        recall[t] = rc[-1] if nd else 0
        q = np.zeros((R,))
        pr = pr.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds2 = np.searchsorted(rc, p.recThrs, side="left")
        try:
            for ri, pi in enumerate(inds2):
                q[ri] = pr[pi]
        except IndexError:
            pass
        precision[t] = np.array(q)
    return {"precision": precision, "recall": recall}


def oracle_evaluate(
    gts_by_img: Dict[int, List[dict]],
    dts_by_img: Dict[int, List[dict]],
    sigmas: Sequence[float],
    max_dets: int = 20,
) -> Dict[str, float]:
    """Full COCOeval keypoint pipeline; returns the 10 summary stats."""
    p = OracleParams(np.asarray(sigmas), max_dets)
    k = len(p.sigmas)
    img_ids = sorted(gts_by_img.keys())
    dts_by_img = {
        i: [_load_res_fields(d, k) for d in dts_by_img.get(i, [])] for i in img_ids
    }

    accs = {}
    for name, rng in p.areaRng.items():
        evals = [
            _evaluate_img(gts_by_img[i], dts_by_img[i], rng, p) for i in img_ids
        ]
        accs[name] = _accumulate(evals, p)

    def ap(acc, thr=None):
        pr = acc["precision"]
        if thr is not None:
            t = int(np.where(np.isclose(p.iouThrs, thr))[0][0])
            pr = pr[t]
        valid = pr[pr > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    def ar(acc, thr=None):
        rc = acc["recall"]
        if thr is not None:
            t = int(np.where(np.isclose(p.iouThrs, thr))[0][0])
            rc = rc[t : t + 1]
        valid = rc[rc > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    return {
        "AP": ap(accs["all"]),
        "AP .5": ap(accs["all"], 0.5),
        "AP .75": ap(accs["all"], 0.75),
        "AP (M)": ap(accs["medium"]),
        "AP (L)": ap(accs["large"]),
        "AR": ar(accs["all"]),
        "AR .5": ar(accs["all"], 0.5),
        "AR .75": ar(accs["all"], 0.75),
    }


def oracle_evaluate_crowdpose(
    gts_by_img: Dict[int, List[dict]],
    dts_by_img: Dict[int, List[dict]],
    sigmas: Sequence[float],
    crowd_index: Dict[int, float],
    max_dets: int = 20,
) -> Dict[str, float]:
    """crowdposetools.cocoeval keypoint pipeline (transcription).

    Differences from pycocotools COCOeval (the reference consumes this via
    ``/root/reference/lib/dataset/CrowdPoseDataset.py:281-296``):
      * every area bucket is the full range [0, 1e10] — per-image evals are
        computed ONCE with no area-based gt/dt ignores;
      * the easy/medium/hard stats re-accumulate the same per-image evals
        over image subsets selected by the annotation file's per-image
        ``crowdIndex``: easy ci <= 0.1, medium 0.1 < ci < 0.8,
        hard ci >= 0.8 (the CrowdPose paper's buckets; boundary values are
        measure-zero in the real dataset);
      * stats order: the reference reads indexes [0,1,2,5,6,7,8,9,10] as
        AP, AP.5, AP.75, AR, AR.5, AR.75, AP(E), AP(M), AP(H).
    """
    p = OracleParams(np.asarray(sigmas), max_dets)
    k = len(p.sigmas)
    img_ids = sorted(gts_by_img.keys())
    dts_by_img = {
        i: [_load_res_fields(d, k) for d in dts_by_img.get(i, [])] for i in img_ids
    }
    full = (0.0, 1e5**2)
    evals = {i: _evaluate_img(gts_by_img[i], dts_by_img[i], full, p) for i in img_ids}

    def acc_over(ids):
        return _accumulate([evals[i] for i in ids], p)

    def ap(acc, thr=None):
        pr = acc["precision"]
        if thr is not None:
            t = int(np.where(np.isclose(p.iouThrs, thr))[0][0])
            pr = pr[t]
        valid = pr[pr > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    def ar(acc, thr=None):
        rc = acc["recall"]
        if thr is not None:
            t = int(np.where(np.isclose(p.iouThrs, thr))[0][0])
            rc = rc[t : t + 1]
        valid = rc[rc > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    main = acc_over(img_ids)
    easy = acc_over([i for i in img_ids if crowd_index[i] <= 0.1])
    med = acc_over([i for i in img_ids if 0.1 < crowd_index[i] < 0.8])
    hard = acc_over([i for i in img_ids if crowd_index[i] >= 0.8])
    return {
        "AP": ap(main),
        "AP .5": ap(main, 0.5),
        "AP .75": ap(main, 0.75),
        "AR": ar(main),
        "AR .5": ar(main, 0.5),
        "AR .75": ar(main, 0.75),
        "AP (E)": ap(easy),
        "AP (M)": ap(med),
        "AP (H)": ap(hard),
    }
