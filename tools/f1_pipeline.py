"""f1_pipeline.py — the scaled north-star F1 validation, end to end.

Round-2's F1 number came from 12 slides / 80 held-out objects — too small
to resolve regressions under ~3%. This orchestrates the full pipeline at
statistical scale through the REAL CLIs (the same commands a user runs):

  1. gen        synthetic train + held-out slide sets with annotations
  2. preprocess preprocess.py -> scdx16p100.d archive (x16 mirrors/rotations)
  3. train      train.py (centerOffsetRes10, bf16, device-resident) on TPU
  4. serve      test.py -c (live device-fused tiling) AND trace.py +
                test.py -m (traced StableHLO host path) on the SAME slides
  5. eval       traced-vs-live detection equality + P/R/F1 vs dedupe
                radius table -> report.md + report.json

Usage:
    python tools/f1_pipeline.py --root workspace/f1_r3 --stage all
    (stages are idempotent; rerun with --stage eval to re-score)

The serve/train stages need the TPU (single-tenant: never run while
another chip client is live).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

MARGINS = "168 112 168 112"  # pads 1200x800 slides to 512-multiples


def run(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def stage_gen(args):
    from scd_resnet_tpu.data.synthetic import make_slide_and_annotation

    for i in range(args.train_slides):
        make_slide_and_annotation(
            os.path.join(args.root, "train_imgs"),
            os.path.join(args.root, "train_annots"), i + 1,
            objects=args.train_objects, seed=100)
    for i in range(args.test_slides):
        make_slide_and_annotation(
            os.path.join(args.root, "test_imgs"),
            os.path.join(args.root, "test_annots"), i + 1,
            objects=args.test_objects, seed=5000)
    print("gen: {} train / {} held-out slides".format(
        args.train_slides, args.test_slides))


def stage_preprocess(args):
    os.makedirs(os.path.join(args.root, "data"), exist_ok=True)
    run([sys.executable, "preprocess.py",
         os.path.join(args.root, "data", "scdx16p100.d"),
         "-i", os.path.join(args.root, "train_imgs"),
         "-a", os.path.join(args.root, "train_annots"),
         "-s", "512", "-m", MARGINS])


def stage_train(args):
    cfg = {
        "datasetName": "scdx16p100",
        "modelName": args.arch,
        "trainName": "f1-r3",
        "batchSize": 32,
        "validationBatchSize": 64,
        "iterations": args.iters,
        "validation": args.iters // 2,
        "snapshot": args.iters,
        "learningRate": 0.00025,
        "learningRateDecay": [int(args.iters * 0.85)],
        "learningRateDecayRate": [10],
        "precision": "bfloat16",
        "dirTemp": os.path.join(args.root, "temp") + "/",
        "dirResult": os.path.join(args.root, "results") + "/",
        "dirDataset": os.path.join(args.root, "data") + "/",
    }
    cfg_path = os.path.join(args.root, "f1.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)
    run([sys.executable, "train.py", cfg_path, "-gpu"])


def _ckpt(args):
    return os.path.join(args.root, "temp",
                        "{}.f1-r3.{}.pth".format(args.arch, args.iters))


def _slides(args):
    img_dir = os.path.join(args.root, "test_imgs")
    return [os.path.join(img_dir, n) for n in sorted(
        os.listdir(img_dir), key=lambda n: int(os.path.splitext(n)[0]))]


def stage_serve(args):
    slides = _slides(args)
    # live device-fused path (no dedupe: radii are applied post-hoc in
    # eval so one serve covers the whole sweep)
    run([sys.executable, "test.py", "-c", _ckpt(args), "-a", args.arch,
         "--pipelined", "--fit",
         "-o", os.path.join(args.root, "live.json")] + slides)
    # traced StableHLO host path on the same slides
    bundle = os.path.join(args.root, "f1-r3.pt")
    run([sys.executable, "trace.py", bundle, "-a", args.arch,
         "-m", _ckpt(args), "-s", "24 1 512 512"])
    run([sys.executable, "test.py", "-m", bundle,
         "-o", os.path.join(args.root, "traced.json")] + slides)


def _by_image(payload):
    from tools.f1_eval import group_detections

    return group_detections(payload, with_rhr=True)


def stage_eval(args):
    from scd_resnet_tpu.data.labels import load_markers
    from scd_resnet_tpu.infer.analyse import dedupe_detections
    from tools.f1_eval import match_f1

    with open(os.path.join(args.root, "live.json")) as f:
        live = _by_image(json.load(f))
    with open(os.path.join(args.root, "traced.json")) as f:
        traced = _by_image(json.load(f))

    # ---- traced-vs-live equality on identical slides --------------------
    # positions and per-slide counts must match exactly (<=1 px); the
    # regressed Rhr is allowed half a histogram bin (5e-3) of bf16
    # cross-compilation jitter — the two paths compile the same params
    # under different fusion orders (batch-all-clips vs fixed-24 batches)
    assert set(live) == set(traced), "different slide sets analyzed"
    total = mismatched = 0
    max_rhr_dev = 0.0
    for image in live:
        a = sorted(live[image])
        b = sorted(traced[image])
        total += max(len(a), len(b))
        if len(a) != len(b):
            mismatched += abs(len(a) - len(b))
            a, b = a[: len(b)], b[: len(a)]
        for pa, pb in zip(a, b):
            if abs(pa[0] - pb[0]) > 1 or abs(pa[1] - pb[1]) > 1 \
                    or abs(pa[2] - pb[2]) > 5e-3:
                mismatched += 1
            max_rhr_dev = max(max_rhr_dev, abs(pa[2] - pb[2]))
    eq_rate = 1.0 - mismatched / max(total, 1)
    print("traced-vs-live: {} detections, {} mismatched "
          "({:.3%} identical, max Rhr deviation {:.2e})".format(
              total, mismatched, eq_rate, max_rhr_dev))

    # ---- P/R/F1 vs dedupe radius ---------------------------------------
    annot_dir = os.path.join(args.root, "test_annots")
    gt = {}
    for image in live:
        stem = os.path.splitext(os.path.basename(image))[0]
        markers = load_markers(os.path.join(annot_dir, stem + ".txt"))
        gt[image] = np.asarray(
            [m.center for m in markers], np.float64).reshape(-1, 2)
    n_objects = int(sum(len(g) for g in gt.values()))

    rows = []
    for radius in [None, 8.0, 16.0, 24.0, 32.0]:
        for name, dets in (("live", live), ("traced", traced)):
            tp = fp = fn = 0
            for image, pred in dets.items():
                if radius is not None:
                    pred = dedupe_detections([list(p) for p in pred], radius)
                xy = np.asarray([p[:2] for p in pred],
                                np.float64).reshape(-1, 2)
                t, p_, n_, *_ = match_f1(xy, gt[image], args.match_radius)
                tp, fp, fn = tp + t, fp + p_, fn + n_
            precision = tp / max(tp + fp, 1)
            recall = tp / max(tp + fn, 1)
            f1 = 2 * precision * recall / max(precision + recall, 1e-9)
            rows.append({"dedupe": radius or 0, "path": name, "tp": tp,
                         "fp": fp, "fn": fn, "precision": round(precision, 4),
                         "recall": round(recall, 4), "f1": round(f1, 4)})

    report = {
        "slides": len(live), "objects": n_objects,
        "equality_rate": round(eq_rate, 5),
        "max_rhr_deviation": round(max_rhr_dev, 6),
        "match_radius": args.match_radius,
        "table": rows,
    }
    with open(os.path.join(args.root, "report.json"), "w") as f:
        json.dump(report, f, indent=2)

    lines = [
        "# Scaled F1 validation ({})".format(
            os.path.basename(args.root.rstrip("/"))), "",
        "{} held-out slides, {} objects; greedy one-to-one matching at "
        "radius {} px; traced-vs-live identical rate {:.3%}.".format(
            len(live), n_objects, args.match_radius, eq_rate), "",
        "| dedupe px | path | TP | FP | FN | P | R | F1 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| {dedupe:g} | {path} | {tp} | {fp} | {fn} | "
                     "{precision:.3f} | {recall:.3f} | {f1:.3f} |".format(**r))
    with open(os.path.join(args.root, "report.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    assert eq_rate >= 0.995, (
        "traced and live paths disagree on >0.5% of detections")


STAGES = ["gen", "preprocess", "train", "serve", "eval"]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", default="workspace/f1_r3")
    parser.add_argument("--stage", default="all",
                        choices=STAGES + ["all"])
    parser.add_argument("--arch", default="centerOffsetRes10")
    parser.add_argument("--train-slides", type=int, default=16)
    parser.add_argument("--train-objects", type=int, default=40)
    parser.add_argument("--test-slides", type=int, default=60)
    parser.add_argument("--test-objects", type=int, default=10)
    parser.add_argument("--iters", type=int, default=3000)
    parser.add_argument("--match-radius", type=float, default=24.0)
    args = parser.parse_args()
    args.root = os.path.abspath(args.root)
    os.makedirs(args.root, exist_ok=True)

    for stage in (STAGES if args.stage == "all" else [args.stage]):
        print("==== stage: {} ====".format(stage), flush=True)
        globals()["stage_" + stage](args)


if __name__ == "__main__":
    main()
