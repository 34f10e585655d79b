"""Timing, tracking, and distributed-info utilities."""

import json
import os

from repmode_tpu.utils.timing import PhaseTimer
from repmode_tpu.utils.tracking import Tracker


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    log = t.as_log_dict()
    assert set(log) == {"time/a", "time/b"}
    assert log["time/a"] >= 0
    assert t.pop("a") >= 0
    assert t.pop("a") == 0.0  # popped


def test_tracker_jsonl(tmp_path):
    tr = Tracker(str(tmp_path), offline=True)
    tr.log({"loss": 0.5, "note": "x", "skip_array": [1, 2]})
    tr.set_summary("best", 1.23)
    tr.finish()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    rec = json.loads(lines[-1])
    assert rec["loss"] == 0.5 and rec["note"] == "x"
    assert "skip_array" not in rec  # non-scalars filtered
    assert tr.summary["best"] == 1.23


def test_tracker_config_snapshot(tmp_path):
    """The full run config is snapshotted next to metrics.jsonl
    (reference main.py:107-108 json.dump(vars(opts)))."""
    from repmode_tpu.config import Config

    cfg = Config()
    tr = Tracker(str(tmp_path), config=json.loads(cfg.to_json()), offline=True)
    tr.finish()
    snap = json.load(open(tmp_path / "config.json"))
    assert snap["train"]["lr"] == cfg.train.lr
    assert tuple(snap["data"]["adopted_datasets"]) == cfg.data.adopted_datasets


def test_tracker_eval_config_does_not_clobber_train(tmp_path):
    """An evaluate run pointed at the same logs dir must not overwrite the
    training run's config.json (the reference writes the options file once
    per training run, main.py:107-108)."""
    tr = Tracker(str(tmp_path), config={"phase": "train"}, offline=True)
    tr.finish()
    ev = Tracker(str(tmp_path), config={"phase": "eval"}, offline=True,
                 entry_point="evaluate")
    ev.finish()
    assert json.load(open(tmp_path / "config.json"))["phase"] == "train"
    assert json.load(open(tmp_path / "config_evaluate.json"))["phase"] == "eval"


def test_tracker_code_snapshot(tmp_path):
    """Key sources are snapshotted into <logs>/code/ (reference
    main.py:100-106 wandb.save of SSPdataset/fnet_model/<nn>/config)."""
    from repmode_tpu.cli.train import snapshot_sources
    from repmode_tpu.config import Config

    files = snapshot_sources(Config())
    assert all(os.path.isfile(f) for f in files), files
    tr = Tracker(str(tmp_path), offline=True,
                 code_files=list(files) + [str(tmp_path / "missing.py")])
    tr.finish()
    snapped = sorted(os.listdir(tmp_path / "code"))
    assert snapped == sorted(os.path.basename(f) for f in files)
    for f in files:  # byte-identical copies
        with open(f, "rb") as a, open(tmp_path / "code" / os.path.basename(f), "rb") as b:
            assert a.read() == b.read()


def test_flops_model():
    """The analytic FLOP model that grounds bench.py's TFLOPS/MFU claims."""
    from repmode_tpu.config import ModelConfig
    from repmode_tpu.infer.tiling import compute_patch_starts
    from repmode_tpu.utils.flops import (
        tiled_inference_flops,
        tiling_patch_count,
    )

    cfg = ModelConfig()
    info = tiled_inference_flops(cfg, (32, 624, 924), (32, 128, 128))
    # the reference grid (fnet_model.py:156-164): 1 x 9 x 14 patches
    assert info["n_patches"] == 126
    assert abs(info["redundancy"] - 3.58) < 0.01
    # headline numbers cited in BASELINE.md
    assert abs(info["flops_per_voxel_unique"] - 2.084e6) / 2.084e6 < 0.01
    assert abs(info["flops_per_patch"] - 1.092e12) / 1.092e12 < 0.01

    # patch-count formula == the actual tiling grid, including edge cases
    for vol in [(32, 624, 924), (32, 128, 128), (32, 129, 200), (48, 130, 128)]:
        starts = compute_patch_starts(vol, (32, 128, 128), 0.5)
        assert tiling_patch_count(vol, (32, 128, 128), 0.5) == len(starts), vol


def test_process_info():
    from repmode_tpu.parallel.distributed import process_info

    info = process_info()
    assert info["process_count"] >= 1
    assert info["local_devices"] >= 1
