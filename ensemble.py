#!/usr/bin/env python
"""Multi-stream score fusion — the '2s' in 2s-AGCN, generalized.

Parity target: reference ensemble.py: load joint-stream and bone-stream
score pickles, fuse r = r_joint + alpha * r_bone, report top-1/top-5.
Superset: --scores/--alphas fuse ANY number of streams (the standard
4-stream joint/bone/joint-motion/bone-motion setup of the 2s-AGCN
lineage) as r = sum_i alpha_i * r_i.

Usage:
    python ensemble.py --label val_label.pkl \
        --joint-score work_dir/joint/score/epoch50_val.pkl \
        --bone-score work_dir/bone/score/epoch50_val.pkl --alpha 1.0
    python ensemble.py --label val_label.pkl \
        --scores j.pkl b.pkl jm.pkl bm.pkl --alphas 1 1 0.5 0.5
"""

import argparse
import pickle

import numpy as np


def load_scores(path):
    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, dict):
        return list(obj.keys()), np.stack([np.asarray(v)
                                           for v in obj.values()])
    return None, np.asarray(obj)


def load_labels(path):
    with open(path, "rb") as f:
        try:
            obj = pickle.load(f)
        except UnicodeDecodeError:
            f.seek(0)
            obj = pickle.load(f, encoding="latin1")
    if isinstance(obj, tuple) or (isinstance(obj, list) and len(obj) == 2
                                  and not np.isscalar(obj[0])):
        return np.asarray(obj[1])
    return np.asarray(obj)


def ensemble_many(labels, scores, alphas, topk=(1, 5)):
    """r = sum_i alpha_i * r_i over any number of streams."""
    fused = sum(a * s for a, s in zip(alphas, scores))
    rank = fused.argsort(axis=-1)
    out = {}
    for k in topk:
        hits = [l in rank[i, -k:] for i, l in enumerate(labels)]
        out[k] = sum(hits) / len(hits)
    return out


def ensemble(labels, joint, bone, alpha=1.0, topk=(1, 5)):
    """Two-stream fusion (reference ensemble.py:25) — the N=2 case."""
    return ensemble_many(labels, [joint, bone], [1.0, alpha], topk)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--label", required=True)
    p.add_argument("--joint-score", default=None)
    p.add_argument("--bone-score", default=None)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--scores", nargs="+", default=None,
                   help="N score pickles to fuse (generalizes the "
                        "two-stream flags)")
    p.add_argument("--alphas", type=float, nargs="+", default=None,
                   help="per-stream weights for --scores (default all 1)")
    args = p.parse_args(argv)

    labels = load_labels(args.label)
    if args.scores:
        scores = [load_scores(s)[1] for s in args.scores]
        alphas = args.alphas or [1.0] * len(scores)
        if len(alphas) != len(scores):
            p.error("--alphas must match --scores in length")
        accs = ensemble_many(labels, scores, alphas)
    elif args.joint_score and args.bone_score:
        _, joint = load_scores(args.joint_score)
        _, bone = load_scores(args.bone_score)
        accs = ensemble(labels, joint, bone, args.alpha)
    else:
        p.error("--scores, or --joint-score with --bone-score, required")
    for k, v in accs.items():
        print(f"top-{k}: {v:.4f}")
    return accs


if __name__ == "__main__":
    main()
