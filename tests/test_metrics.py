"""Metric parity vs sklearn (the reference's metric backend, fnet/metric.py)."""

import numpy as np
import pytest

from repmode_tpu.metrics import MetricAggregator, metric_stats, metric_stats_device


def test_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn")
    from sklearn import metrics as skm

    p = rng.standard_normal((4, 50, 60)).astype(np.float32)
    t = (p + 0.3 * rng.standard_normal(p.shape)).astype(np.float32)
    ours = metric_stats(p, t)
    np.testing.assert_allclose(ours["MSE"], skm.mean_squared_error(t.ravel(), p.ravel()), rtol=1e-7)
    np.testing.assert_allclose(ours["MAE"], skm.mean_absolute_error(t.ravel(), p.ravel()), rtol=1e-7)
    np.testing.assert_allclose(ours["R2"], skm.r2_score(t.ravel(), p.ravel()), rtol=1e-7)


def test_device_close_to_host(rng):
    p = rng.standard_normal((2, 30, 30)).astype(np.float32)
    t = rng.standard_normal((2, 30, 30)).astype(np.float32)
    host = metric_stats(p, t)
    dev = {k: float(v) for k, v in metric_stats_device(p, t).items()}
    for k in host:
        np.testing.assert_allclose(dev[k], host[k], rtol=1e-4)


def test_aggregator_csvs(tmp_path, rng):
    agg = MetricAggregator()
    for i, ds in enumerate(["a", "a", "b"]):
        agg.add(ds, f"/x/{i}.czi", {"MSE": float(i), "MAE": 0.1 * i, "R2": 0.9})
    comp, spec, final = agg.frames()
    assert list(comp.columns[:3]) == ["dataset", "path_czi", "img_id"]
    assert len(spec) == 2
    np.testing.assert_allclose(
        spec[spec.dataset == "a"].MSE.iloc[0], 0.5
    )
    np.testing.assert_allclose(final.MSE.iloc[0], 1.0)

    log = agg.log_dict("val", epoch=3)
    assert log["X-axis/epoch"] == 4
    assert "metric_val/MSE" in log and "metric_val_MSE/a" in log

    agg.to_csvs(str(tmp_path), "exp")
    assert (tmp_path / "comp_exp.csv").exists()
    assert (tmp_path / "spec_exp.csv").exists()
    assert (tmp_path / "final_exp.csv").exists()
