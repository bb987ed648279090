"""Command-line entry points (the reference's per-script drivers as one CLI).

Usage:
  python -m pope_tpu.cli eval --dataset linemod --data-root data --pairs-dir data/pairs
  python -m pope_tpu.cli demo-dinov2 --image data/demos/inputs/target.png
  python -m pope_tpu.cli demo-sam --image data/demos/inputs/target.png
  python -m pope_tpu.cli extract --dataset linemod ...
  python -m pope_tpu.cli train-regressor --dataset onepose ...
  python -m pope_tpu.cli test-regressor --dataset onepose --ckpt ...

Mirrors: eval_{linemod,onepose,ycb}_json.py / acc1-30_*.py (eval),
visual_dinov2.py / visual_sam.py / visual_3dbbox.py (demos), linemod.py /
onepose.py / ycbv.py (extract), train0429*.py / train0604.py (train),
test0608.py (test), segment_anything/scripts/amg.py (amg).
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_model_args(p):
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--sam-type", default="h", choices=["b", "l", "h"])
    p.add_argument("--dinov2-checkpoint", default=None)
    p.add_argument("--matcher-checkpoint", default=None)


def cmd_eval(args):
    from pope_tpu.eval import evaluate_dataset, results_to_xlsx
    from pope_tpu.eval.evaluate import results_table
    from pope_tpu.pipeline import load_models

    if args.serial and (args.dp or args.batch_size is not None):
        raise SystemExit("--serial runs one pair at a time on one chip; "
                         "it contradicts --dp/--batch-size (drop one)")
    models = load_models(
        sam_checkpoint=args.sam_checkpoint,
        sam_type=args.sam_type,
        dinov2_checkpoint=args.dinov2_checkpoint,
        matcher_checkpoint=args.matcher_checkpoint,
    )
    if args.serial:
        # the reference's per-pair loop shape (eval_linemod_json.py:51);
        # produces identical records to the batched default
        from pope_tpu.pipeline.runner import run_pair

        per_obj = evaluate_dataset(
            models, args.dataset, args.data_root, args.pairs_dir, run_pair,
            max_pairs=args.max_pairs,
        )
    else:
        mesh = None
        if args.dp and args.dp > 1:
            from pope_tpu.parallel import make_mesh

            mesh = make_mesh(args.dp, tp=1)
        per_obj = evaluate_dataset(
            models, args.dataset, args.data_root, args.pairs_dir,
            max_pairs=args.max_pairs,
            batch_size=args.batch_size if args.batch_size is not None else 4,
            mesh=mesh,
        )
    print(results_table(per_obj))
    if args.xlsx:
        results_to_xlsx(per_obj, args.xlsx)
        print(f"wrote {args.xlsx}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(per_obj, f, indent=2)


def cmd_demo_dinov2(args):
    from pope_tpu.pipeline import load_models
    from pope_tpu.pipeline.demos import demo_dinov2_heatmap

    models = load_models(
        dinov2_checkpoint=args.dinov2_checkpoint, sam_type="b"
    )
    demo_dinov2_heatmap(models, args.image, args.out)
    print(f"wrote {args.out}")


def cmd_demo_sam(args):
    from pope_tpu.pipeline import load_models
    from pope_tpu.pipeline.demos import demo_sam_masks

    models = load_models(sam_checkpoint=args.sam_checkpoint, sam_type=args.sam_type)
    demo_sam_masks(models, args.image, args.out)
    print(f"wrote {args.out}")


def cmd_amg(args):
    """scripts/amg.py: batch mask generation over an image or directory,
    writing PNG-folder + metadata.csv or COCO-RLE json per image."""
    import dataclasses

    from pope_tpu.config import PipelineConfig
    from pope_tpu.pipeline import load_models
    from pope_tpu.pipeline.amg_cli import run_amg

    cfg = PipelineConfig()
    overrides = {
        k: getattr(args, k)
        for k in (
            "points_per_side", "pred_iou_thresh", "stability_score_thresh",
            "box_nms_thresh", "min_mask_region_area", "mask_capacity",
            "crop_n_layers", "crop_nms_thresh",
        )
        if getattr(args, k) is not None
    }
    if overrides:
        cfg = dataclasses.replace(cfg, amg=dataclasses.replace(cfg.amg, **overrides))
    models = load_models(
        config=cfg, sam_checkpoint=args.sam_checkpoint, sam_type=args.sam_type,
    )
    done = run_amg(models, args.input, args.output, convert_to_rle=args.convert_to_rle)
    print(f"processed {len(done)} image(s) -> {args.output}")


def cmd_export(args):
    """scripts/export_onnx_model.py: serialize a serving head as a StableHLO
    artifact (the ONNX surface's jax-world equivalent)."""
    from pope_tpu.export import (
        export_dinov2,
        export_matcher,
        export_sam_decoder,
        export_sam_prompt_head,
    )
    from pope_tpu.pipeline import load_models

    component = {
        "sam-prompt-head": "sam", "sam-decoder": "sam",
        "matcher": "matcher", "dinov2": "dinov2",
    }[args.target]
    models = load_models(
        sam_checkpoint=args.sam_checkpoint, sam_type=args.sam_type,
        dinov2_checkpoint=args.dinov2_checkpoint,
        matcher_checkpoint=args.matcher_checkpoint,
        components=(component,),
    )
    if args.target == "sam-prompt-head":
        export_sam_prompt_head(
            models.sam, models.sam_variables, orig_hw=(args.orig_h, args.orig_w),
            num_points=args.num_points,
            return_single_mask=args.return_single_mask,
            use_stability_score=args.use_stability_score, path=args.output,
        )
    elif args.target == "sam-decoder":
        export_sam_decoder(
            models.sam, models.sam_variables, num_points=args.num_points,
            path=args.output,
        )
    elif args.target == "matcher":
        export_matcher(
            models.matcher, models.matcher_variables,
            hw0=(args.orig_h, args.orig_w), hw1=(args.crop_size, args.crop_size),
            path=args.output,
        )
    else:  # dinov2
        # default 196: what the pipeline actually serves (center-crop to
        # 196px, pose_pipeline retrieval crops) — NOT config.dinov2.img_size
        # (the pretrain resolution, 518); jax.export artifacts are
        # static-shape, so the export resolution must match the consumer
        export_dinov2(
            models.dinov2, models.dinov2_variables,
            img_size=args.img_size, path=args.output,
        )
    print(f"wrote {args.output}")


def cmd_parse_lm(args):
    """parse_lm_real_data.py / scripts/parse_linemod_objs.sh: convert
    CDPN-format LINEMOD to the OnePose directory layout."""
    from pope_tpu.eval.parse_lm import convert_all, convert_object

    if args.obj_id is not None:
        for split in args.splits:
            convert_object(args.data_base_dir, args.obj_id, args.output_dir, split=split)
    else:
        convert_all(args.data_base_dir, args.output_dir, splits=tuple(args.splits))
    print(f"converted -> {args.output_dir}")


def cmd_demo_3dbbox(args):
    """visual_3dbbox.py: one (prompt, target) pair -> query_result.png +
    3D_BBox.png. K0/K1/bbox default to the reference's hardcoded demo
    values (visual_3dbbox.py:19-41); poses load from prompt.txt/target.txt
    beside the images (:119-120)."""
    import os

    import numpy as np

    from pope_tpu.pipeline import load_models
    from pope_tpu.pipeline.demos import demo_3dbbox

    K0 = (
        np.loadtxt(args.k0) if args.k0 else np.array(
            [[2442.28864, 0.0, 449.114027],
             [0.0, 2447.23383, -110.724309],
             [0.0, 0.0, 1.0]]
        )
    )
    K1 = (
        np.loadtxt(args.k1) if args.k1 else np.array(
            [[572.4114, 0.0, 325.2611],
             [0.0, 573.57043, 242.04899],
             [0.0, 0.0, 1.0]]
        )
    )
    if args.box3d:
        corners = np.loadtxt(args.box3d)
    else:
        x, y, z = 0.03793430, 0.03879960, 0.04588450
        corners = np.array(
            [[-x, -y, -z], [-x, -y, z], [-x, y, z], [-x, y, -z],
             [x, -y, -z], [x, -y, z], [x, y, z], [x, y, -z]]
        )
    d = os.path.dirname(args.prompt)
    prompt_pose = np.loadtxt(args.prompt_pose or os.path.join(d, "prompt.txt"))
    tgt_path = args.target_pose or os.path.join(d, "target.txt")
    target_pose = np.loadtxt(tgt_path) if os.path.exists(tgt_path) else None

    models = load_models(
        sam_checkpoint=args.sam_checkpoint,
        sam_type=args.sam_type,
        dinov2_checkpoint=args.dinov2_checkpoint,
        matcher_checkpoint=args.matcher_checkpoint,
    )
    demo_3dbbox(
        models, args.prompt, args.target, K0, K1, prompt_pose, corners,
        target_pose=target_pose, out_query=args.out_query, out_bbox=args.out_bbox,
    )
    print(f"wrote {args.out_query} and {args.out_bbox}")


def cmd_demo_web(args):
    """segment_anything/demo/: interactive click->mask segmentation. The
    encoder runs once at startup; every click is served by the exported
    StableHLO decode head (the reference's in-browser ONNX head)."""
    import cv2

    from pope_tpu.pipeline import load_models
    from pope_tpu.serve import WebDemo, run_demo_server

    models = load_models(sam_checkpoint=args.sam_checkpoint, sam_type=args.sam_type)
    image = cv2.imread(args.image)[:, :, ::-1]
    demo = WebDemo(models.sam, models.sam_variables, image, max_points=args.max_points)
    run_demo_server(demo, host=args.host, port=args.port)


def cmd_serve_pose(args):
    """Online pose service: POST /pose coalesces concurrent requests into
    device batches (the eval driver's batched pipeline, behind a queue).
    The reference has no serving surface for its pose pipeline."""
    from pope_tpu.pipeline import load_models
    from pope_tpu.serve import PoseService, make_pose_server

    models = load_models(
        sam_checkpoint=args.sam_checkpoint,
        sam_type=args.sam_type,
        dinov2_checkpoint=args.dinov2_checkpoint,
        matcher_checkpoint=args.matcher_checkpoint,
    )
    service = PoseService(
        models, crop_size=args.crop_size, batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms,
    )
    server = make_pose_server(service, host=args.host, port=args.port)
    print(f"serving pose estimation on http://{args.host}:{server.server_address[1]}/pose")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        service.shutdown(drain=False)


def cmd_extract(args):
    from pope_tpu.eval.extract import extract_dataset

    extract_dataset(args)


def cmd_train_regressor(args):
    from pope_tpu.models.regressor.driver import train_main

    train_main(args)


def cmd_test_regressor(args):
    from pope_tpu.models.regressor.driver import test_main

    test_main(args)


def cmd_train_matcher(args):
    from pope_tpu.train.matcher_driver import train_main

    train_main(args)


def cmd_train_ssl(args):
    from pope_tpu.train.ssl_driver import train_main

    if getattr(args, "distributed", False):
        from pope_tpu.parallel.launch import initialize, resolve_env

        initialize(resolve_env(
            coordinator=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        ))
    train_main(args)


def cmd_render_novel_view(args):
    from pope_tpu.nvs.driver import render_main

    render_main(args)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pope_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("eval", help="manifest-driven dataset evaluation")
    pe.add_argument("--dataset", required=True, choices=["linemod", "onepose", "onepose_plusplus", "ycbv"])
    pe.add_argument("--data-root", default="data")
    pe.add_argument("--pairs-dir", default="data/pairs")
    pe.add_argument("--max-pairs", type=int, default=None)
    pe.add_argument(
        "--batch-size", type=int, default=None,
        help="pairs per device batch, default 4 "
        "(the batched production path is the default)",
    )
    pe.add_argument(
        "--dp", type=int, default=None,
        help="data-parallel mesh size: shard every stage over N chips "
        "(batch-size must be divisible by it)",
    )
    pe.add_argument(
        "--serial", action="store_true",
        help="reference-shaped per-pair loop instead of the batched driver",
    )
    pe.add_argument("--xlsx", default=None)
    pe.add_argument("--json-out", default=None)
    _add_model_args(pe)
    pe.set_defaults(fn=cmd_eval)

    pd = sub.add_parser("demo-dinov2", help="patch-PCA heatmap demo")
    pd.add_argument("--image", required=True)
    pd.add_argument("--out", default="headmap.jpg")
    pd.add_argument("--dinov2-checkpoint", default=None)
    pd.set_defaults(fn=cmd_demo_dinov2)

    ps = sub.add_parser("demo-sam", help="automatic mask generation demo")
    ps.add_argument("--image", required=True)
    ps.add_argument("--out", default="LINEMOD_mask.png")
    _add_model_args(ps)
    ps.set_defaults(fn=cmd_demo_sam)

    pa = sub.add_parser(
        "amg",
        help="batch automatic mask generation (scripts/amg.py: PNG folder "
        "+ metadata.csv per image, or COCO-RLE json with --convert-to-rle)",
    )
    pa.add_argument("--input", required=True, help="image file or directory")
    pa.add_argument("--output", required=True, help="output directory")
    pa.add_argument("--convert-to-rle", action="store_true")
    pa.add_argument("--points-per-side", type=int, default=None)
    pa.add_argument("--pred-iou-thresh", type=float, default=None)
    pa.add_argument("--stability-score-thresh", type=float, default=None)
    pa.add_argument("--box-nms-thresh", type=float, default=None)
    pa.add_argument("--min-mask-region-area", type=int, default=None)
    pa.add_argument("--mask-capacity", type=int, default=None)
    pa.add_argument("--crop-n-layers", type=int, default=None)
    pa.add_argument("--crop-nms-thresh", type=float, default=None)
    _add_model_args(pa)
    pa.set_defaults(fn=cmd_amg)

    pex = sub.add_parser(
        "export",
        help="serialize a serving head as StableHLO "
        "(scripts/export_onnx_model.py equivalent)",
    )
    pex.add_argument(
        "--target", required=True,
        choices=["sam-prompt-head", "sam-decoder", "matcher", "dinov2"],
    )
    pex.add_argument("--output", required=True)
    pex.add_argument("--orig-h", type=int, default=480)
    pex.add_argument("--orig-w", type=int, default=640)
    pex.add_argument("--crop-size", type=int, default=256)
    pex.add_argument("--num-points", type=int, default=8)
    pex.add_argument(
        "--img-size", type=int, default=196,
        help="dinov2 export input resolution (196 = the pipeline's serving crop)",
    )
    pex.add_argument("--return-single-mask", action="store_true")
    pex.add_argument("--use-stability-score", action="store_true")
    _add_model_args(pex)
    pex.set_defaults(fn=cmd_export)

    pl = sub.add_parser(
        "parse-lm", help="convert CDPN-format LINEMOD to the OnePose layout"
    )
    pl.add_argument("--data-base-dir", required=True)
    pl.add_argument("--output-dir", required=True)
    pl.add_argument("--obj-id", type=int, default=None, help="single object id (default: all)")
    pl.add_argument("--splits", nargs="+", default=["train", "val"])
    pl.set_defaults(fn=cmd_parse_lm)

    pb = sub.add_parser("demo-3dbbox", help="single-pair pipeline + 3-D bbox render")
    pb.add_argument("--prompt", required=True, help="prompt image path")
    pb.add_argument("--target", required=True, help="target image path")
    pb.add_argument("--k0", default=None, help="prompt intrinsics txt (default: reference demo K0)")
    pb.add_argument("--k1", default=None, help="target intrinsics txt (default: reference demo K1)")
    pb.add_argument("--box3d", default=None, help="8x3 bbox corners txt (default: reference demo extents)")
    pb.add_argument("--prompt-pose", default=None, help="prompt pose txt (default: prompt.txt beside --prompt)")
    pb.add_argument("--target-pose", default=None, help="target pose txt (default: target.txt beside --prompt)")
    pb.add_argument("--out-query", default="query_result.png")
    pb.add_argument("--out-bbox", default="3D_BBox.png")
    _add_model_args(pb)
    pb.set_defaults(fn=cmd_demo_3dbbox)

    pw = sub.add_parser("demo-web", help="interactive segmentation web demo (browser)")
    pw.add_argument("--image", required=True)
    pw.add_argument("--host", default="127.0.0.1")
    pw.add_argument("--port", type=int, default=8081)
    pw.add_argument("--max-points", type=int, default=8)
    _add_model_args(pw)
    pw.set_defaults(fn=cmd_demo_web)

    pv = sub.add_parser(
        "serve-pose",
        help="online pose-estimation HTTP service (continuous batching)",
    )
    pv.add_argument("--host", default="127.0.0.1")
    pv.add_argument("--port", type=int, default=8082)
    pv.add_argument("--batch-size", type=int, default=4)
    pv.add_argument(
        "--max-wait-ms", type=float, default=8.0,
        help="how long the batcher waits for a batch to fill after the "
        "first request arrives",
    )
    pv.add_argument("--crop-size", type=int, default=256)
    _add_model_args(pv)
    pv.set_defaults(fn=cmd_serve_pose)

    px = sub.add_parser("extract", help="dump mkpts/crops for regressor training")
    px.add_argument("--dataset", required=True, choices=["linemod", "onepose", "onepose_plusplus", "ycbv"])
    px.add_argument("--data-root", default="data")
    px.add_argument("--pairs-dir", default="data/pairs")
    px.add_argument("--out-dir", required=True)
    px.add_argument("--max-pairs", type=int, default=None)
    _add_model_args(px)
    px.set_defaults(fn=cmd_extract)

    pt = sub.add_parser("train-regressor", help="train the pose regressor")
    pt.add_argument("--dataset", required=True)
    pt.add_argument("--points-dir", required=True)
    pt.add_argument("--data-root", default="data")
    pt.add_argument(
        "--net-mode", default="mkpts",
        choices=["mkpts", "imgs", "mkpts+imgs", "mkpts+vim", "vim"],
    )
    pt.add_argument("--rotation-mode", default="6d", choices=["6d", "quat", "matrix"])
    pt.add_argument(
        "--fusion", default="cross_attn", choices=["cross_attn", "transformer"],
        help="branch fusion: model0429 cross-attn or model0604 transformer pair",
    )
    pt.add_argument("--vim-size", default="small", choices=["tiny", "small"])
    pt.add_argument("--epochs", type=int, default=100)
    pt.add_argument("--num-sample", type=int, default=500)
    pt.add_argument("--ckpt-dir", default="checkpoints")
    pt.set_defaults(fn=cmd_train_regressor)

    pr = sub.add_parser("test-regressor", help="evaluate a trained regressor")
    pr.add_argument("--dataset", required=True)
    pr.add_argument("--points-dir", required=True)
    pr.add_argument("--data-root", default="data")
    pr.add_argument("--ckpt", required=True)
    pr.add_argument("--num-sample", type=int, default=500)
    pr.set_defaults(fn=cmd_test_regressor)

    ptm = sub.add_parser(
        "train-matcher",
        help="train the LoFTR matcher on multi-scene data with auc@10-"
        "monitored checkpointing (scripts/train.py equivalent)",
    )
    ptm.add_argument("--data-source", default="megadepth",
                     choices=["megadepth", "scannet"])
    ptm.add_argument("--data-root", required=True)
    ptm.add_argument("--train-npz", nargs="+", required=True,
                     help="one npz scene index per training scene")
    ptm.add_argument("--val-npz", nargs="+", required=True)
    ptm.add_argument("--intrinsic-path", default=None,
                     help="scannet per-scene intrinsics npz")
    ptm.add_argument("--min-overlap-score", type=float, default=0.4)
    ptm.add_argument("--img-resize", type=int, default=840,
                     help="megadepth longest-side resize (IMG_RESIZE)")
    ptm.add_argument("--depth-max-size", type=int, default=2000)
    ptm.add_argument("--batch-size", type=int, default=4,
                     help="global batch per step (lr scales with it)")
    ptm.add_argument("--epochs", type=int, default=30)
    ptm.add_argument("--n-samples-per-subset", type=int, default=200)
    ptm.add_argument("--canonical-lr", type=float, default=6e-3)
    ptm.add_argument("--warmup-steps", type=int, default=4800)
    ptm.add_argument("--epi-err-thr", type=float, default=5e-4,
                     help="5e-4 for ScanNet, 1e-4 for MegaDepth")
    ptm.add_argument("--dp", type=int, default=1, help="data-parallel mesh size")
    ptm.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    ptm.add_argument("--ckpt-dir", default=None)
    ptm.add_argument("--resume", action="store_true",
                     help="continue from <ckpt-dir>/last at the saved epoch")
    ptm.add_argument("--history-out", default=None,
                     help="write the per-epoch train/val metric history json")
    ptm.add_argument("--seed", type=int, default=66)
    ptm.set_defaults(fn=cmd_train_matcher)

    pssl = sub.add_parser(
        "train-ssl", help="DINOv2 self-supervised pretraining (DINO+iBOT+KoLeo)"
    )
    pssl.add_argument("--image-root", required=True)
    pssl.add_argument("--arch", default="vit_small",
                      choices=["vit_small", "vit_base", "vit_large", "vit_giant"])
    pssl.add_argument(
        "--drop-path-rate", type=float, default=0.3,
        help="student stochastic depth (ssl_default_config.yaml:74)",
    )
    pssl.add_argument("--global-crop-size", type=int, default=224)
    pssl.add_argument("--local-crop-size", type=int, default=98)
    pssl.add_argument("--n-local-crops", type=int, default=8)
    pssl.add_argument("--batch-size", type=int, default=8)
    pssl.add_argument("--total-steps", type=int, default=125000)
    pssl.add_argument("--lr", type=float, default=4e-3)
    pssl.add_argument("--dp", type=int, default=1, help="data-parallel mesh size")
    pssl.add_argument("--ckpt-dir", default=None)
    pssl.add_argument("--ckpt-every", type=int, default=1000)
    pssl.add_argument("--seed", type=int, default=0)
    pssl.add_argument(
        "--distributed", action="store_true",
        help="multi-host: bootstrap jax.distributed from POPE_*/SLURM env "
        "before training (parallel/launch.py; every pod host runs the same "
        "command)",
    )
    pssl.add_argument("--coordinator", default=None,
                      help="host:port of process 0 (overrides env)")
    pssl.add_argument("--num-processes", type=int, default=None)
    pssl.add_argument("--process-id", type=int, default=None)
    pssl.set_defaults(fn=cmd_train_ssl)

    pnv = sub.add_parser(
        "render-novel-view",
        help="novel-view synthesis from a posed LINEMOD sequence (per-scene NeRF)",
    )
    pnv.add_argument("--seq-root", required=True,
                     help="sequence dir containing color/ poses_ba/ intrin_ba/")
    pnv.add_argument("--source-ids", default="100,101,102,103,104,105,106,107,108,109,110")
    pnv.add_argument("--target-ids", default=None)
    pnv.add_argument("--out-dir", default=".")
    pnv.add_argument("--label", default=None)
    pnv.add_argument("--train-steps", type=int, default=2000)
    pnv.add_argument("--downscale", type=int, default=1)
    pnv.add_argument("--seed", type=int, default=0)
    pnv.add_argument("--lpips-alexnet", default=None,
                     help="torchvision alexnet-*.pth (backbone) for LPIPS")
    pnv.add_argument("--lpips-lins", default=None,
                     help="lpips-package weights/v0.1/alex.pth (calibrated heads)")
    pnv.set_defaults(fn=cmd_render_novel_view)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
