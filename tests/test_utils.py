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


def test_process_info():
    from repmode_tpu.parallel.distributed import process_info

    info = process_info()
    assert info["process_count"] >= 1
    assert info["local_devices"] >= 1
