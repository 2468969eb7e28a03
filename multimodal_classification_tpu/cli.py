"""CLI: ``mmc-tpu run --pipeline=<name>`` — the reference's
``kedro run --pipeline=<name>`` surface (reference: __main__.py:12-24)."""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def _read_id_file(path: str):
    """Ids for the device feature cache: one per line, or a .jsonl whose
    records carry an 'id' field."""
    ids = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("{"):
                rec = json.loads(line)
                if rec.get("id") is not None:
                    ids.append(str(rec["id"]))
            else:
                ids.append(line)
    return ids


def _calibration_examples(params, root: str, n: int):
    """Texts + ids from the validation split, for int8 static-activation-
    scale calibration (``ServingModel.calibrate``)."""
    from multimodal_classification_tpu.pipelines.base import run_data_processing

    df = run_data_processing(params, root)["val"].head(n)
    return list(df["text"].astype(str)), [{"id": str(i)} for i in df["id"]]


def main(argv=None) -> int:
    # Persistent XLA compilation cache by default: on the remote-compile TPU
    # relay a full-model compile costs minutes, and every subcommand
    # (run/serve/bench/export) re-pays it otherwise. Respected only if the
    # user hasn't pointed the cache elsewhere. jax reads this lazily at
    # first compile, so setting it here (before any jax import) is safe.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

    # MMC_PLATFORM=cpu forces the backend regardless of what the host's
    # sitecustomize latched (on the axon image the JAX_PLATFORMS env var is
    # consumed before any user code runs, so it CANNOT redirect a subprocess
    # — this config knob can; utils/doctor.py and demo_e2e use the same
    # mechanism). Offline gates (reproduce_lmdb_auroc --dry-run) rely on it.
    if os.environ.get("MMC_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["MMC_PLATFORM"])

    parser = argparse.ArgumentParser(
        prog="mmc-tpu",
        description="TPU-native multimodal classification framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    run_p = sub.add_parser("run", help="run a named pipeline")
    run_p.add_argument("--pipeline", default="__default__")
    run_p.add_argument("--root", default=".", help="project root (conf/, data/)")
    run_p.add_argument(
        "--params", nargs="*", default=None,
        help="parameter YAML paths and/or dotted.key=value overrides "
             "(default: conf/base + conf/local; e.g. "
             "--params training_lmdb.learning_rate=3e-5 vilbert.dropout=0.2)",
    )
    run_p.add_argument("--experiment", default="Default", help="tracking experiment name")
    run_p.add_argument(
        "--resume", action="store_true",
        help="continue a training pipeline from its 'last' full-state "
             "checkpoint (written per epoch, on SIGTERM preemption, and at "
             "the final epoch)",
    )
    run_p.add_argument(
        "--variant", default=None,
        help="override the config variant for validate/inference pipelines "
             "(the reference hardwires them to the default resnet feature "
             "source; e.g. --pipeline=vilbert_validate --variant lmdb "
             "evaluates an lmdb-trained checkpoint with lmdb features)",
    )

    list_p = sub.add_parser("list", help="list pipelines / models / extractors")
    list_p.add_argument("what", choices=["pipelines", "models", "extractors"])

    plots_p = sub.add_parser(
        "plots", help="render comparison/training-curve figures from mlruns/ "
                      "(the reference's generate_plots.py)")
    plots_p.add_argument("--root", default=".", help="project root (mlruns/)")
    plots_p.add_argument("--out", default=None,
                         help="output dir (default <root>/plots)")

    serve_p = sub.add_parser(
        "serve", help="online inference server (micro-batching HTTP) over a "
                      "trained checkpoint")
    serve_p.add_argument("--variant", default="lmdb",
                         help="config variant (feature source + model block)")
    serve_p.add_argument("--root", default=".", help="project root")
    serve_p.add_argument("--host", default="127.0.0.1")
    serve_p.add_argument("--port", type=int, default=8000)
    serve_p.add_argument("--batch-size", type=int, default=16,
                         help="compiled micro-batch size")
    serve_p.add_argument("--linger-ms", type=float, default=5.0,
                         help="micro-batch aggregation window")
    serve_p.add_argument("--request-timeout", type=float, default=30.0,
                         help="per-request deadline (s): must exceed the "
                              "worst-case queue wait or timed-out retries "
                              "pile onto the backlog")
    serve_p.add_argument("--busy-hold-ms", type=float, default=None,
                         help="cap on collect-while-busy after the linger "
                              "expires (default: hold until the in-flight "
                              "batch completes — the throughput policy; a "
                              "small cap trades batch size for latency at "
                              "low concurrency)")
    serve_p.add_argument("--int8", action="store_true",
                         help="int8 MXU serving path (throughput configs)")
    serve_p.add_argument(
        "--seq-buckets", default=None,
        help="comma-separated seq-length buckets (e.g. 32,64); each batch "
             "dispatches the smallest compiled length that fits its longest "
             "text (default: config serving_seq_buckets, else one program "
             "at max_seq_length)",
    )
    serve_p.add_argument(
        "--mesh", default=None, metavar="DP,MP",
        help="multi-chip serving: shard each compiled batch over a dp×mp "
             "device mesh (e.g. --mesh 8,1 on a v5e-8; -1 infers one axis "
             "from the device count)",
    )
    serve_p.add_argument(
        "--calibrate", type=int, default=0, metavar="N",
        help="with --int8: calibrate STATIC activation scales on N validation "
             "examples before serving (removes the per-row quantize "
             "max-reduction; see ops/quant.py)",
    )
    serve_p.add_argument(
        "--batch-sizes", default=None, metavar="B1,B2",
        help="comma-separated batch-size programs (e.g. 1,16,112): each "
             "dispatch pads to the smallest compiled batch that fits, so "
             "online singles stop paying the record-batch pad (one extra "
             "compile per seq bucket per size)",
    )
    serve_p.add_argument(
        "--preload-ids", default=None, metavar="PATH",
        help="file of ids (one per line, or a .jsonl with an 'id' field): "
             "preload their features into HBM and serve id-only requests "
             "through the device-resident gather path — only token ids + "
             "row indices cross the host link (single-chip only)",
    )
    serve_p.add_argument(
        "--preload-max-gb", type=float, default=None, metavar="GB",
        help="cap the device feature cache's HBM residency; ids beyond the "
             "cap transparently serve via the host feature path (same "
             "predictions, host-upload throughput)",
    )
    serve_p.add_argument(
        "--artifact", default=None,
        help="serve from an exported artifact directory (mmc-tpu export) "
             "instead of tracing the model — params/buckets/int8 come from "
             "the artifact manifest; --batch-size/--int8/--seq-buckets are "
             "ignored",
    )

    export_p = sub.add_parser(
        "export", help="package the serving model as a portable artifact "
                       "(StableHLO programs per seq bucket + params.npz + "
                       "manifest) loadable without model code")
    export_p.add_argument("--variant", default="lmdb",
                          help="config variant (feature source + model block)")
    export_p.add_argument("--root", default=".", help="project root")
    export_p.add_argument("--out", required=True, help="artifact output directory")
    export_p.add_argument("--batch-size", type=int, default=16)
    export_p.add_argument("--int8", action="store_true",
                          help="export the int8 MXU serving path")
    export_p.add_argument("--seq-buckets", default=None,
                          help="comma-separated seq buckets (default: config)")
    export_p.add_argument(
        "--platforms", default=None,
        help="comma-separated target platforms (e.g. tpu,cpu); default: "
             "current backend only")
    export_p.add_argument(
        "--calibrate", type=int, default=0, metavar="N",
        help="with --int8: bake STATIC activation scales (calibrated on N "
             "validation examples) into the exported program")

    doctor_p = sub.add_parser(
        "doctor", help="diagnose the environment: backend reachability "
                       "(hang-proof, time-boxed probe), native components, "
                       "compilation cache")
    doctor_p.add_argument("--timeout", type=float, default=60.0,
                          help="seconds to wait for the accelerator backend")

    bench_p = sub.add_parser(
        "bench", help="run a benchmark: train (bench.py), serving, extraction")
    bench_p.add_argument("what", choices=["train", "serving", "extraction"],
                         nargs="?", default="train")

    args = parser.parse_args(argv)
    from multimodal_classification_tpu.utils.logging import setup_logging

    setup_logging(log_dir=os.path.join(getattr(args, "root", "."), "logs")
                  if args.command == "run" else None)

    if args.command == "doctor":
        from multimodal_classification_tpu.utils.doctor import main as doctor_main

        return doctor_main(args.timeout)

    if args.command == "list":
        from multimodal_classification_tpu import registry

        items = {
            "pipelines": registry.list_available_pipelines,
            "models": registry.list_available_models,
            "extractors": registry.list_available_extractors,
        }[args.what]()
        print("\n".join(items))
        return 0

    if args.command == "plots":
        from multimodal_classification_tpu.utils.plots import generate_plots

        written = generate_plots(
            mlruns_root=os.path.join(args.root, "mlruns"),
            out_dir=args.out or os.path.join(args.root, "plots"),
        )
        print("\n".join(written))
        return 0

    if args.command == "bench":
        import runpy

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = {
            "train": os.path.join(repo, "bench.py"),
            "serving": os.path.join(repo, "scripts", "bench_serving.py"),
            "extraction": os.path.join(repo, "scripts", "bench_extraction.py"),
        }[args.what]
        if not os.path.exists(script):
            parser.error(f"benchmark script not found: {script} "
                         "(bench scripts live in the source checkout)")
        runpy.run_path(script, run_name="__main__")
        return 0

    from multimodal_classification_tpu.config import default_parameter_paths, load_parameters

    if args.command in ("serve", "export"):
        from multimodal_classification_tpu.config import experiment_from_parameters
        from multimodal_classification_tpu.pipelines.base import (
            build_model_and_params,
            make_feature_store,
        )
        from multimodal_classification_tpu.data import load_tokenizer
        from multimodal_classification_tpu.serving import (
            InferenceServer,
            ServingModel,
            export_artifact,
            load_artifact,
        )
        from multimodal_classification_tpu.training.train import Trainer

        vocab = None
        try:
            params = load_parameters(*default_parameter_paths(args.root))
            ex = experiment_from_parameters(params, args.variant)
            store = make_feature_store(args.variant, ex, args.root)
            vocab = ex.data.tokenizer_vocab
            if vocab and not os.path.isabs(vocab):
                vocab = os.path.join(args.root, vocab)
            tokenizer = load_tokenizer(vocab, ex.data.lowercase)
        except Exception:
            if not (args.command == "serve" and args.artifact):
                raise
            # bare host: no project config — a self-contained artifact
            # carries its own vocab; features must ride in the requests
            logging.getLogger(__name__).info(
                "no project config under %s — serving the artifact "
                "self-contained", args.root)
            tokenizer = store = None

        if args.command == "serve" and args.artifact:
            serving = load_artifact(args.artifact, tokenizer, store)
        else:
            model, params_tree = build_model_and_params(ex, args.root)
            trainer = Trainer(model, ex,
                              checkpoint_dir=os.path.join(args.root, ex.output_dir))
            if trainer.ckpt.exists("best"):
                params_tree = trainer.ckpt.restore("best")["params"]
                logging.getLogger(__name__).info("loaded 'best' checkpoint")
            seq_buckets = (
                tuple(int(b) for b in args.seq_buckets.split(","))
                if args.seq_buckets else ex.serving_seq_buckets
            )
            common = dict(
                max_seq_length=ex.data.max_seq_length,
                num_regions=getattr(store, "num_regions", ex.data.max_regions),
                feature_dim=getattr(store, "feature_dim", ex.data.visual_feature_dim),
                batch_size=args.batch_size,
                int8=args.int8 or ex.serving_int8,
                int8_min_dim=ex.serving_int8_min_dim,
                seq_buckets=seq_buckets,
            )
            calib = None
            if args.calibrate and common["int8"]:
                calib = _calibration_examples(params, args.root, args.calibrate)
            if args.command == "export":
                quant = None
                if calib is not None:
                    sm = ServingModel(model, params_tree, tokenizer, store, **common)
                    sm.calibrate(*calib)
                    quant = sm._quant
                manifest = export_artifact(
                    model, params_tree, args.out, quant=quant,
                    platforms=(args.platforms.split(",") if args.platforms else None),
                    vocab_path=vocab, lowercase=ex.data.lowercase,
                    **common,
                )
                print(json.dumps(manifest, indent=2))
                return 0
            mesh = None
            if getattr(args, "mesh", None):
                from multimodal_classification_tpu.parallel.mesh import build_mesh

                mesh = build_mesh(tuple(int(x) for x in args.mesh.split(",")))
            if getattr(args, "batch_sizes", None):
                common["batch_sizes"] = tuple(
                    int(b) for b in args.batch_sizes.split(","))
            serving = ServingModel(model, params_tree, tokenizer, store,
                                   mesh=mesh, **common)
            if calib is not None:
                serving.calibrate(*calib)
            if getattr(args, "preload_ids", None):
                cap = getattr(args, "preload_max_gb", None)
                if cap is not None and cap < 0:
                    raise SystemExit("--preload-max-gb must be >= 0")
                n = serving.preload_features(
                    _read_id_file(args.preload_ids),
                    max_bytes=int(cap * 1e9) if cap is not None else None)
                logging.getLogger(__name__).info(
                    "preloaded %d ids into the device feature cache", n)
        serving.warmup()
        server = InferenceServer(serving, args.host, args.port,
                                 linger_ms=args.linger_ms,
                                 request_timeout_s=args.request_timeout,
                                 busy_hold_ms=args.busy_hold_ms)
        server.serve_forever()
        return 0

    from multimodal_classification_tpu.registry import get_pipeline
    from multimodal_classification_tpu.utils.tracking import Tracker

    raw = args.params or []
    overrides = [a for a in raw if "=" in a]
    paths = [a for a in raw if "=" not in a]
    params = load_parameters(*(paths or default_parameter_paths(args.root)))
    if overrides:
        from multimodal_classification_tpu.config import apply_param_overrides

        apply_param_overrides(params, overrides)
    pipeline = get_pipeline(args.pipeline)
    if args.variant is not None:
        import functools

        if not isinstance(pipeline, functools.partial):
            parser.error(f"--variant is not supported by pipeline {args.pipeline}")
        pipeline = functools.partial(pipeline.func, args.variant,
                                     **pipeline.keywords)
    tracker = Tracker(root=f"{args.root}/mlruns", experiment=args.experiment)
    if args.pipeline == "data_processing":
        result = pipeline(params, root=args.root)
    else:
        kwargs = {"root": args.root, "tracker": tracker}
        if args.resume:
            import functools
            import inspect

            target = pipeline.func if isinstance(pipeline, functools.partial) else pipeline
            if "resume" not in inspect.signature(target).parameters:
                parser.error(f"--resume is not supported by pipeline {args.pipeline}")
            kwargs["resume"] = True
        result = pipeline(params, **kwargs)
    logging.getLogger(__name__).info("pipeline %s finished: %s", args.pipeline,
                                     type(result).__name__)
    return 0


if __name__ == "__main__":
    sys.exit(main())
