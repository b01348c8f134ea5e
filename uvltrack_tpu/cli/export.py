"""Export the per-frame inference step as a serialized StableHLO artifact.

Beyond-parity deployment surface (the reference ships only torch
checkpoints: tracking/profile_model.py re-traces the model in every
process). `jax.export` captures the jitted `forward_test` — the exact
program bench.py measures — as a versioned, platform-tagged StableHLO
blob that non-Python runtimes (IFRT/PJRT loaders, serving sidecars) can
execute without this package or its Python deps, and that pins the traced
program for reproducible deployments.

Usage:
  python -m uvltrack_tpu.cli.export --config baseline_base \
      --checkpoint UVLTrack_ep0300.pth.tar --out uvltrack_b.stablehlo \
      [--platforms tpu,cpu] [--batch 1] [--check]

Writes `<out>` (the serialized exported program) and `<out>.json` (a
manifest: argument shapes/dtypes, platforms, config). `--check`
round-trips the blob through jax.export.deserialize and asserts the
restored program reproduces the direct call to 1e-5 rtol/atol on random
inputs (same backend; not asserted bit-identical).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def export_forward(cfg, model, variables, batch: int = 1,
                   platforms=None):
    """Returns (exported, args): the jax.export'd forward_test program on
    `batch`-sized inputs and the concrete example args it was traced with.

    The traced function and example-argument recipe are the SHARED
    `models.uvltrack.forward_test_fn/example_test_inputs` — the same pair
    the driver compile check (__graft_entry__.entry) traces, so the
    deployment artifact can never skew from the validated program."""
    import jax
    from jax import export as jexport

    from ..models.uvltrack import example_test_inputs, forward_test_fn

    fn = forward_test_fn(model)
    args = (variables,) + example_test_inputs(cfg, model, batch=batch)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    exported = jexport.export(jax.jit(fn), **kwargs)(*args)
    return exported, args


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="baseline_base")
    p.add_argument("--checkpoint", default=None,
                   help="optional .pth.tar / msgpack checkpoint; random "
                        "init when omitted (artifact-shape testing)")
    p.add_argument("--out", default="uvltrack.stablehlo")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--platforms", default=None,
                   help="comma list (e.g. tpu,cpu); default: the current "
                        "backend only")
    p.add_argument("--check", action="store_true",
                   help="deserialize the written blob and assert it "
                        "reproduces the direct jit call on the example "
                        "inputs")
    args = p.parse_args(argv)

    import jax
    from jax import export as jexport

    from ..config import load_cfg
    from ..eval.environment import env_settings, experiment_cfg_path
    from .test import build_tracker

    cfg = load_cfg(experiment_cfg_path(env_settings(), "uvltrack",
                                       args.config))
    cfg.TPU.COMPUTE_DTYPE = "float32"  # the artifact is precision-explicit
    tracker = build_tracker(cfg, args.checkpoint)
    model, variables = tracker.jt.model, tracker.jt.variables

    platforms = (args.platforms.split(",") if args.platforms else None)
    exported, ex_args = export_forward(cfg, model, variables,
                                       batch=args.batch,
                                       platforms=platforms)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)

    leaves = jax.tree_util.tree_leaves(ex_args)
    manifest = {
        "config": args.config,
        "checkpoint": args.checkpoint,
        "batch": args.batch,
        "platforms": list(exported.platforms),
        "n_args_flat": len(leaves),
        "example_arg_shapes": [list(np.shape(a)) for a in leaves[-6:]],
        "outputs": ["bbox_map", "cls_score_test", "cont_score"],
        "calling_convention_version":
            int(exported.calling_convention_version),
        "bytes": len(blob),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {args.out} ({len(blob)/1e6:.1f} MB, "
          f"platforms={manifest['platforms']}) + manifest")

    if args.check:
        restored = jexport.deserialize(blob)
        got = restored.call(*ex_args)
        # direct (unexported) reference call
        from ..models.uvltrack import UVLTrack

        ref = jax.jit(lambda v, *a: model.apply(
            v, *a, method=UVLTrack.forward_test))(variables, *ex_args[1:])
        ref = (ref["bbox_map"], ref["cls_score_test"], ref["cont_score"])
        for g, w, name in zip(got, ref, manifest["outputs"]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=name)
        print("check: deserialized program matches the direct call")


if __name__ == "__main__":
    main()
