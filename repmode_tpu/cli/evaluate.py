"""Eval-only entry point (reference eval.py).

    python -m repmode_tpu.cli.evaluate --path_load_model exps/e/checkpoints/model_best_e [...]

Loads a checkpoint (ours, or a reference torch `.p` via --torch_checkpoint)
and runs the test pass only (eval.py:27-169 semantics: config comes from the
checkpoint, eval runs on the test split, metrics written as CSVs).
"""

from __future__ import annotations

import json
import time

from repmode_tpu.cli.args import build_parser, to_config
from repmode_tpu.cli.train import build_stores
from repmode_tpu.train.loop import ExperimentDirs, run_eval_pass
from repmode_tpu.infer.predict import TiledPredictor
from repmode_tpu.utils.logging import setup_logger
from repmode_tpu.utils.tracking import Tracker


def main(argv=None):
    t0 = time.time()
    parser = build_parser(eval_only=True)
    parser.add_argument("--torch_checkpoint", type=str, default=None,
                        help="import a reference PyTorch .p checkpoint")
    ns = parser.parse_args(argv)
    if not ns.torch_checkpoint and not ns.path_load_model:
        parser.error(
            "no checkpoint source: pass --path_load_model <ckpt dir> "
            "or --torch_checkpoint <reference .p file>"
        )
    cfg = to_config(ns)

    dirs = ExperimentDirs(cfg)
    logger = setup_logger(dirs.logs, cfg.exp_name)
    tracker = Tracker(dirs.logs, run_name=cfg.run_name,
                      config=json.loads(cfg.to_json()),
                      offline=cfg.debugging, run_id=ns.id,
                      entry_point="evaluate")

    # model
    if ns.torch_checkpoint:
        import jax

        from repmode_tpu.compat.torch_import import load_torch_checkpoint
        from repmode_tpu.train.state import create_train_state
        import jax.numpy as jnp

        imported = load_torch_checkpoint(ns.torch_checkpoint)
        if imported["adopted_datasets"]:
            cfg = cfg.replace(
                data=cfg.data.__class__(
                    **{**cfg.data.__dict__,
                       "adopted_datasets": tuple(imported["adopted_datasets"])}
                )
            )
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        variables = jax.tree.map(jnp.asarray, imported["variables"])
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        logger.info(f"[MODEL]   Imported torch checkpoint: {ns.torch_checkpoint}")
    else:
        from repmode_tpu.ckpt import restore_train_state

        state, cfg = restore_train_state(cfg.path_load_model)
        logger.info(f"[MODEL]   Model loaded from: {ns.path_load_model}")

    # Saved config wins for the architecture/data identity (eval.py:86-95
    # semantics), but this run's identity and execution surface are the
    # caller's: where results land, how the run is named, and --num_devices
    # (the mesh for THIS eval, not the training run's device count).
    import dataclasses

    cli = to_config(ns)
    cfg = dataclasses.replace(
        cfg,
        path_exp_dir=cli.path_exp_dir,
        exp_name=cli.exp_name,
        run_name=cli.run_name,
        debugging=cli.debugging,
        path_load_model=ns.path_load_model,
        train=dataclasses.replace(cfg.train, num_devices=ns.num_devices),
        eval=dataclasses.replace(
            cfg.eval,
            save_test_preds=cli.eval.save_test_preds,
            save_test_signals_and_targets=cli.eval.save_test_signals_and_targets,
        ),
    )

    stores = build_stores(cfg, logger, synthetic=ns.synthetic)

    # --num_devices: shard eval over a DP mesh exactly like the train-time
    # eval surface (train/loop.py mesh block) — the two_phase predictor
    # shards the patch grid; the default fused predictor is single-device.
    mesh = None
    pred_mode = cfg.eval.predictor
    if cfg.train.num_devices > 1:
        from repmode_tpu.parallel import make_mesh, replicate

        mesh = make_mesh(cfg.train.num_devices)
        state = replicate(mesh, state)
        if pred_mode == "fused":
            pred_mode = "two_phase"
            logger.info(
                "[EVAL]    DP mesh: predictor fused -> two_phase "
                "(patch grid sharded over all devices)"
            )
    predictor = TiledPredictor(
        cfg, mode=pred_mode, mesh=mesh if pred_mode == "two_phase" else None
    )
    test_log, agg = run_eval_pass(
        cfg, state, stores["test"], predictor, "test", pred_dir=dirs.preds
    )
    logger.info("[TEST]    Test | MSE: {:.6f}".format(test_log["metric_test/MSE"]))
    agg.to_csvs(dirs.metrics, cfg.exp_name)
    for k, v in test_log.items():
        tracker.set_summary(k, v)
    tracker.finish()
    logger.info("[TIME]    Elapsed time: {:.1f} s".format(time.time() - t0))
    return test_log


if __name__ == "__main__":
    main()
