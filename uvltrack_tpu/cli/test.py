"""Evaluation CLI: run a tracker over a benchmark and save result files.

Parity with tracking/test.py: `python -m uvltrack_tpu.cli.test uvltrack
baseline_base --dataset_name otb99 --test_checkpoint <path>`; results land in
<results>/<dataset>_<MODE>_<EPOCH>/<seq>.txt.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_tracker(cfg, checkpoint: str | None):
    import jax

    from ..core.tokenizer import BertTokenizer
    from ..models.convert import convert_uvltrack, load_torch_file
    from ..models.uvltrack import build_model, init_model
    from ..track.tracker import Tracker

    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    if checkpoint:
        if checkpoint.endswith((".pth", ".pth.tar", ".bin")):
            state = load_torch_file(checkpoint)
            params, bstats, unused = convert_uvltrack(
                state, variables["params"], variables.get("batch_stats", {}))
            if unused:
                print(f"converter: {len(unused)} unused keys (e.g. {unused[:3]})")
            import jax.numpy as jnp

            variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                         "batch_stats": jax.tree_util.tree_map(jnp.asarray, bstats)}
        else:
            from ..train.checkpoint import CheckpointManager

            mgr = CheckpointManager(os.path.dirname(checkpoint))
            state, _, _ = mgr.restore_raw(path=checkpoint)
            variables = {"params": state["params"],
                         "batch_stats": state.get("batch_stats", {})}
    tok = None
    from ..eval.environment import env_settings, resolve_path

    # resolve the (default-relative) vocab path against repo/pretrained
    # dirs — a bare CWD-relative exists() check silently dropped the
    # tokenizer, tracking NL/NLBBOX sequences with empty text
    vocab = resolve_path(env_settings(),
                         cfg.MODEL.BACKBONE.LANGUAGE.VOCAB_PATH)
    if vocab and os.path.exists(vocab):
        tok = BertTokenizer(vocab)
    elif cfg.TEST.MODE in ("NL", "NLBBOX"):
        print(f"WARNING: vocab not found at {vocab!r} — {cfg.TEST.MODE} "
              "mode will run with empty text")
    return Tracker(cfg, model, variables, tokenizer=tok)


def main(argv=None):
    p = argparse.ArgumentParser(description="Run tracker on a benchmark dataset")
    p.add_argument("tracker_name", nargs="?", default="uvltrack")
    p.add_argument("tracker_param", nargs="?", default="baseline_base")
    p.add_argument("--dataset_name", default="otb99")
    p.add_argument("--test_checkpoint", default=None)
    p.add_argument("--runid", type=int, default=None)
    p.add_argument("--sequence", default=None, help="run a single sequence")
    p.add_argument("--rerun", action="store_true")
    p.add_argument("--multichip", action="store_true",
                   help="shard the lockstep streams over all local chips "
                        "(mesh data axis; --streams must divide the chip count)")
    p.add_argument("--streams", type=int, default=0,
                   help="batched evaluation with N lockstep streams per chip "
                        "(replaces the reference's GPU process pool)")
    p.add_argument("--chunk", type=int, default=0,
                   help="scan-chunked single-stream tracking (deferred "
                        "readback, full device throughput)")
    p.add_argument("--save_vis", default=None, metavar="DIR",
                   help="debug: save pred(green)/gt(red) overlay frames per "
                        "sequence under DIR (single-stream runner only)")
    p.add_argument("--vis_stride", type=int, default=1,
                   help="save every Nth overlay frame with --save_vis")
    p.add_argument("--vis_response", action="store_true",
                   help="with --save_vis: also dump cls/merged response-map "
                        "heatmaps per frame (extra readback; debug-grade "
                        "per-frame times)")
    p.add_argument("--quant", default=None, choices=("int8",),
                   help="weight-only quantization of the ViT matmul kernels "
                        "at tracker build (cfg.TPU.WEIGHT_QUANT; ops/quant.py)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="config override (repeatable), e.g. "
                        "--set TEST.MODE=NL — same yacs-style semantics as "
                        "cli/train (strict keys, typed against the default "
                        "leaf)")
    args = p.parse_args(argv)

    from ..config import load_cfg
    from ..eval.datasets import get_dataset
    from ..eval.environment import env_settings, experiment_cfg_path
    from ..eval.metrics import evaluate_results_dir
    from ..eval.running import run_dataset

    settings = env_settings()
    cfg = load_cfg(experiment_cfg_path(settings, args.tracker_name,
                                       args.tracker_param))
    cfg.merge_from_list(args.overrides)
    if args.quant:
        cfg.TPU.WEIGHT_QUANT = args.quant

    if args.test_checkpoint is None:
        # default checkpoint discovery (parity: lib/test/parameter/uvltrack.py's
        # checkpoints/train/uvltrack/<cfg>/UVLTrack_ep%04d.pth.tar pattern)
        ckpt_dir = os.path.join(settings.repo_dir, "checkpoints", "train",
                                args.tracker_name, args.tracker_param)
        for cand in (
            os.path.join(ckpt_dir, f"ep{cfg.TEST.EPOCH:04d}.msgpack"),
            os.path.join(ckpt_dir, f"UVLTrack_ep{cfg.TEST.EPOCH:04d}.pth.tar"),
        ):
            if os.path.exists(cand):
                args.test_checkpoint = cand
                print(f"using checkpoint {cand}")
                break
        else:
            print("no checkpoint found; running with random weights")

    dataset = get_dataset(args.dataset_name)
    if args.sequence:
        dataset = type(dataset)([s for s in dataset if s.name == args.sequence])

    report = f"{args.dataset_name}_{cfg.TEST.MODE}_{cfg.TEST.EPOCH:04d}"
    # --runid N writes under <param>_NNN (reference run_id convention,
    # lib/test/evaluation/tracker.py results_dir) — analyze --run_ids
    # reads these sibling dirs back for multi-run merging
    param_dir = (args.tracker_param if args.runid is None
                 else f"{args.tracker_param}_{args.runid:03d}")
    results_dir = os.path.join(settings.results_path, args.tracker_name,
                               param_dir, report)
    if args.streams > 1:
        from ..eval.running_batched import run_dataset_batched
        from ..track.batch import BatchTracker

        proto = build_tracker(cfg, args.test_checkpoint)
        mesh = None
        if args.multichip:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(data=-1, model=1)

        trackers_by_s = {}

        def factory(S):
            # cache by stream count: initialize() rebuilds all per-group
            # state, and reusing the instance keeps its jit caches — a fresh
            # BatchTracker per group would re-trace/re-compile the full
            # model for every group of the dataset
            if S not in trackers_by_s:
                trackers_by_s[S] = BatchTracker(
                    cfg, proto.jt.model, proto.jt.variables, S,
                    tokenizer=proto.tokenizer, mesh=mesh)
            return trackers_by_s[S]

        if args.save_vis:
            print("--save_vis applies to the single-stream runner only; "
                  "ignoring it with --streams")
        run_dataset_batched(factory, dataset, results_dir,
                            num_streams=args.streams, rerun=args.rerun)
    else:
        run_dataset(lambda: build_tracker(cfg, args.test_checkpoint), dataset,
                    results_dir, rerun=args.rerun, chunk=args.chunk,
                    save_vis=args.save_vis, vis_stride=args.vis_stride,
                    vis_response=args.vis_response)
    # server-evaluated splits (GOT-10k test, TrackingNet test) ship a
    # 1-row groundtruth.txt: scoring them locally forces pred[0]=anno[0]
    # and prints a bogus perfect 100 — point at the packagers instead
    if all(np.asarray(s.ground_truth_rect).shape[0] <= 1 for s in dataset):
        print(f"{args.dataset_name}: ground truth holds only the first "
              "frame (server-evaluated split) — cannot score locally; "
              "package with `python -m uvltrack_tpu.cli.pack` and submit "
              "to the evaluation server")
        return
    try:
        evaluate_results_dir(results_dir, dataset)
    except FileNotFoundError:
        pass


if __name__ == "__main__":
    main()
