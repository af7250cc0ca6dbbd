#!/usr/bin/env python
"""Streaming inference demo CLI.

Parity targets: reference infer/inference.py __main__ (:116-238) — feed a
recorded skeleton sequence frame by frame through the ring-buffer
recognizer and print per-frame predictions and latency — plus the dated
live-demo capabilities (infer/inference_220802.py): weight
auto-discovery from a work dir (:168-189), a live loop over a directory
of skeleton files as they appear (:518-560), and per-prediction G
attention-matrix heatmaps.

Usage:
    python infer.py --config configs/ntu60_xview/train_joint.yaml \
        --weights work_dir/.../checkpoints/epoch_50 \
        --input sample.skeleton --timing
    # live: watch a directory, auto-discover newest checkpoint
    python infer.py --config ... --weights-dir work_dir/ntu/xview/agcn \
        --input recordings/ --follow --save-attention attn/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def load_frames(path: str, num_joint: int):
    """Load an input sequence -> iterator of (M, 1, V, C) frames."""
    if path.endswith(".skeleton"):
        from agcn_tpu.data.gen.ntu import read_xyz

        data = read_xyz(path)  # (3, T, V, M)
        seq = np.transpose(data, (3, 1, 2, 0))  # (M, T, V, C)
    elif path.endswith(".npy"):
        arr = np.load(path)
        if arr.ndim == 5:  # (N, C, T, V, M) -> first sample
            arr = arr[0]
        seq = np.transpose(arr, (3, 1, 2, 0))
    else:
        raise ValueError(f"unsupported input {path}")
    for t in range(seq.shape[1]):
        yield seq[:, t:t + 1]


def discover_weights(work_dir: str) -> str:
    """Newest checkpoint under a work dir (reference
    inference_220802.py:168-189 auto-discovery). Checkpoints are
    directories named <prefix>_<epoch> (Trainer.save_checkpoint) or
    bare .npz files."""
    cands = []
    for root, dirs, files in os.walk(work_dir):
        for d in dirs:
            if d.rsplit("_", 1)[-1].isdigit():
                path = os.path.join(root, d)
                cands.append((os.path.getmtime(path), path))
        for f in files:
            if f.endswith(".npz"):
                path = os.path.join(root, f)
                cands.append((os.path.getmtime(path), path))
    if not cands:
        raise FileNotFoundError(f"no checkpoints under {work_dir}")
    return sorted(cands)[-1][1]


def iter_stream_files(path: str, follow: bool, poll_s: float = 0.5,
                      max_idle_s: float = None):
    """Yield input files: a single file, or every file in a directory in
    mtime order — with --follow, keep polling for NEW files (the live
    demo loop, reference inference_220802.py:518-560). max_idle_s=None
    polls forever; set it to bound the wait (e.g. in tests)."""
    import time as _t

    if os.path.isfile(path):
        yield path
        return
    seen = set()
    idle = 0.0
    while True:
        fresh = scan_new_files(path, seen)
        for e in fresh:
            idle = 0.0
            yield e
        if not follow:
            return
        if not fresh:
            idle += poll_s
            if max_idle_s is not None and idle >= max_idle_s:
                return
            _t.sleep(poll_s)


def scan_new_files(path: str, seen: set):
    """Non-blocking mtime-ordered scan for unseen recordings; marks
    returned entries as seen. Files can vanish between listdir and stat
    (an external recorder renaming/deleting) — those are skipped, not
    fatal."""
    fresh = []
    for name in os.listdir(path):
        if not name.endswith((".skeleton", ".npy")):
            continue
        e = os.path.join(path, name)
        if e in seen:
            continue
        try:
            fresh.append((os.path.getmtime(e), e))
        except OSError:
            continue  # vanished mid-scan; retry next poll
    fresh.sort()
    out = [e for _, e in fresh]
    seen.update(out)
    return out


def _serve(args, model, variables, kind, num_joint, multi_test, cfg,
           labels=None):
    """Multi-stream serving loop: each file in --input is one live
    stream; all streams advance in lock-step and every --interval frames
    ONE batched forward answers all of them (infer/serving.py)."""
    from agcn_tpu.infer.serving import BatchedStreamServer

    server = BatchedStreamServer(
        model, variables, max_streams=args.serve, kind=kind,
        num_joint=num_joint, max_seq_length=args.max_frame,
        moving_avg=args.moving_avg, max_person=args.max_num_skeleton,
        num_skels=args.max_num_skeleton_true,
        normalize=args.aagcn_normalize,
        allowed_classes=args.allowed_classes, multi_test=multi_test,
        sgn_dataloader_args=cfg.test_dataloader_args
        if kind == "sgn" else None)
    streams = {}
    tags = set()
    seen = set()
    backlog = []

    tag_by_sid = {}

    def attach(f):
        sid = server.add_stream()
        tag = os.path.splitext(os.path.basename(f))[0]
        if tag in tags:  # cam0.npy + cam0.skeleton must not clobber
            tag = f"{tag}_{sid}"
        tags.add(tag)
        tag_by_sid[sid] = tag
        streams[sid] = (tag, load_frames(f, num_joint))
        print(f"++ stream [{tag}]", flush=True)

    def scan_new():
        backlog.extend(scan_new_files(args.input, seen))

    def fill_slots():
        while backlog and len(streams) < args.serve:
            f = backlog.pop(0)
            try:
                attach(f)
            except Exception as e:
                # a half-written or corrupt recording must not take the
                # whole multi-camera server down; drop it and move on
                print(f"!! skipping {os.path.basename(f)}: {e}",
                      flush=True)

    scan_new()
    if not backlog and not args.follow:
        raise FileNotFoundError(f"no input files under {args.input}")
    fill_slots()
    out_files = {}
    if args.out_folder:
        os.makedirs(args.out_folder, exist_ok=True)
    import time as _t

    step = 0
    idle = 0.0
    poll_s = 0.5
    pending_step = 0

    def emit(results, at_step):
        for sid, (label, probs) in sorted(results.items()):
            tag = tag_by_sid.get(sid, str(sid))
            name = labels[label] if labels and label < len(labels) \
                else str(label)
            print(f"[{tag}] frame {at_step}: "
                  f"class {name} p={probs[label]:.3f}", flush=True)
            if args.out_folder:
                if sid not in out_files:
                    out_files[sid] = open(os.path.join(
                        args.out_folder, f"results_{tag}.txt"), "w")
                out_files[sid].write(
                    f"{at_step},{label},{probs[label]:.6f}\n")
        if args.timing:
            print(f"tick: {len(results)} streams in "
                  f"{server.last_latency_ms:.1f} ms", flush=True)

    try:
        while True:
            done = []
            for sid, (tag, frames) in streams.items():
                try:
                    frame = next(frames, None)
                except Exception as e:
                    # half-written/corrupt recording: end THIS stream,
                    # keep serving the others
                    print(f"!! stream [{tag}] read error: {e}",
                          flush=True)
                    frame = None
                if frame is None:
                    done.append(sid)
                else:
                    server.append_frame(sid, frame.astype(np.float32))
            for sid in done:
                print(f"-- stream [{streams[sid][0]}] ended", flush=True)
                del streams[sid]
                server.remove_stream(sid)
            # live arrival: pull newly-appeared recordings into free
            # slots (directory scans are O(files) — throttle to the
            # prediction cadence, plus whenever slots just freed)
            if backlog or done or (args.follow
                                   and step % args.interval == 0):
                if args.follow:
                    scan_new()
                fill_slots()
            if not streams:
                # no live streams can answer an in-flight pipelined
                # tick anymore — drain it NOW, not at loop exit (with
                # --follow the loop may idle-poll indefinitely and the
                # final predictions would otherwise never be emitted)
                if args.pipeline:
                    tail = server.flush()
                    if tail is not None:
                        emit(tail, pending_step)
                if not args.follow and not backlog:
                    break  # all recordings served
                if args.follow:
                    scan_new()  # idle: always look for arrivals
                    fill_slots()
                    if streams:
                        idle = 0.0
                        continue
                idle += poll_s
                if args.max_idle is not None and idle >= args.max_idle:
                    break
                _t.sleep(poll_s)
                continue
            idle = 0.0
            step += 1
            if streams and step % args.interval == 0:
                if args.pipeline:
                    # double-buffered: this call answers the PREVIOUS
                    # tick while the device computes this one
                    results = server.predict_async()
                    if results is not None:
                        emit(results, pending_step)
                    pending_step = step
                else:
                    emit(server.predict(), step)
        if args.pipeline:
            tail = server.flush()
            if tail is not None:
                emit(tail, pending_step)
    finally:
        for f in out_files.values():
            f.close()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--weights-dir", default=None,
                   help="auto-discover the newest checkpoint under this "
                        "work dir")
    p.add_argument("--input", required=True,
                   help="skeleton/npy file, or a directory of them")
    p.add_argument("--follow", action="store_true",
                   help="keep watching --input (a directory) for new "
                        "files (live demo loop)")
    p.add_argument("--max-idle", type=float, default=None,
                   help="with --follow: exit after this many seconds "
                        "without new files (default: poll forever)")
    p.add_argument("--save-attention", type=str, default=None,
                   help="write per-prediction G attention heatmaps "
                        "(png) into this directory")
    p.add_argument("--interval", type=int, default=10,
                   help="predict every N frames")
    p.add_argument("--timing", action="store_true")
    p.add_argument("--moving-avg", type=int, default=1)
    p.add_argument("--max-frame", type=int, default=300)
    p.add_argument("--allowed-classes", type=int, nargs="*", default=None)
    # reference inference flag surface (utils/parser.py:229-243)
    p.add_argument("--num-joint", type=int, default=None,
                   help="override the model's joint count")
    p.add_argument("--max-num-skeleton", type=int, default=4,
                   help="ring-buffer person slots")
    p.add_argument("--max-num-skeleton-true", type=int, default=2,
                   help="skeletons fed to the model (energy-selected)")
    p.add_argument("--aagcn-normalize", type=lambda s: s.lower() in
                   ("1", "true", "yes"), default=True)
    p.add_argument("--multi-test", type=int, default=None,
                   help="override SGN multi-crop count")
    p.add_argument("--label-mapping-file", type=str, default=None,
                   help="text file: one class name per line")
    p.add_argument("--out-folder", type=str, default=None,
                   help="write per-frame predictions to <dir>/results.txt")
    p.add_argument("--device", type=str, default=None,
                   help="cpu|tpu|gpu: JAX platform override (like main.py)")
    p.add_argument("--pipeline", action="store_true",
                   help="with --serve: double-buffer host preprocessing "
                        "against device compute (predict_async) — each "
                        "tick prints the previous tick's answers, one "
                        "tick of extra latency for ~overlapped prep")
    p.add_argument("--serve", type=int, default=0, metavar="N",
                   help="multi-stream mode: treat the files in --input "
                        "(a directory) as up to N concurrent streams, "
                        "served in lock-step by ONE batched forward per "
                        "tick (agcn_tpu/infer/serving.py)")
    args = p.parse_args(argv)
    if not args.weights and not args.weights_dir:
        p.error("--weights or --weights-dir required")

    import jax
    if args.device and args.device.lower() in ("cpu", "tpu", "gpu"):
        jax.config.update("jax_platforms", args.device.lower())

    from agcn_tpu.infer import ActionRecognition
    from agcn_tpu.models.registry import build_model
    from agcn_tpu.train.checkpoint import load_checkpoint
    from agcn_tpu.utils.config import load_config

    cfg = load_config(args.config)
    model = build_model(cfg.model, cfg.model_args)
    weights = args.weights or discover_weights(args.weights_dir)
    ckpt = load_checkpoint(weights)
    variables = {"params": ckpt["params"],
                 "batch_stats": ckpt.get("batch_stats", {})}

    kind = "sgn" if "sgn" in cfg.model.lower() else "dense"
    num_joint = args.num_joint or cfg.model_args.get("num_point", 25)
    multi_test = args.multi_test if args.multi_test is not None else (
        cfg.test_dataloader_args.get("multi_test", 1)
        if kind == "sgn" else 1)
    labels = None
    if args.label_mapping_file:
        with open(args.label_mapping_file) as f:
            labels = [ln.strip() for ln in f if ln.strip()]

    if args.serve:
        if not os.path.isdir(args.input):
            p.error("--serve requires --input to be a directory")
        return _serve(args, model, variables, kind, num_joint, multi_test,
                      cfg, labels=labels)

    rec = ActionRecognition(
        model, variables, kind=kind, num_joint=num_joint,
        max_seq_length=args.max_frame, moving_avg=args.moving_avg,
        max_person=args.max_num_skeleton,
        num_skels=args.max_num_skeleton_true,
        normalize=args.aagcn_normalize,
        allowed_classes=args.allowed_classes,
        multi_test=multi_test,
        sgn_dataloader_args=cfg.test_dataloader_args
        if kind == "sgn" else None,
        expose_attention=bool(args.save_attention))

    out_f = None
    if args.out_folder:
        os.makedirs(args.out_folder, exist_ok=True)
        out_f = open(os.path.join(args.out_folder, "results.txt"), "w")

    if args.save_attention:
        os.makedirs(args.save_attention, exist_ok=True)

    try:
        for src in iter_stream_files(args.input, args.follow,
                                     max_idle_s=args.max_idle):
            tag = os.path.splitext(os.path.basename(src))[0]
            if os.path.isdir(args.input):
                print(f"== {src}", flush=True)
            for i, frame in enumerate(load_frames(src, num_joint)):
                rec.append_frame(frame.astype(np.float32))
                if (i + 1) % args.interval == 0:
                    label, probs = rec.predict()
                    name = labels[label] if labels and label < len(labels) \
                        else str(label)
                    line = (f"frame {i + 1}: class {name} "
                            f"p={probs[label]:.3f}")
                    if args.timing:
                        line += f" ({rec.last_latency_ms:.1f} ms)"
                    print(line, flush=True)
                    if out_f:
                        out_f.write(
                            f"{i + 1},{label},{probs[label]:.6f}\n")
                    if args.save_attention and rec.last_attention:
                        # per-prediction G heatmap (reference live demo
                        # visualization, inference_220802.py:518-560)
                        from agcn_tpu.utils.visualization import \
                            plot_attention

                        plot_attention(
                            rec.last_attention[0],
                            save_path=os.path.join(
                                args.save_attention,
                                f"{tag}_f{i + 1}_g0.png"))
    finally:
        if out_f:
            out_f.close()


if __name__ == "__main__":
    main()
