"""Transforms utility set + CSV logger."""

import numpy as np
import pytest

from repmode_tpu.data.transforms import (
    Capper,
    Cropper,
    Padder,
    Propper,
    ReflectionPadder3d,
    Resizer,
    normalize,
)
from repmode_tpu.utils.csv_logger import CsvLogger


class TestTransforms:
    def test_normalize(self, rng):
        x = rng.integers(0, 1000, (5, 6, 7)).astype(np.uint16)
        y = normalize(x)
        assert y.dtype == np.float64
        np.testing.assert_allclose([y.mean(), y.std()], [0, 1], atol=1e-12)

    def test_resizer_matches_scipy(self, rng):
        scipy = pytest.importorskip("scipy")
        import scipy.ndimage

        x = rng.standard_normal((4, 10, 10))
        r = Resizer((1, 0.5, 0.5))
        np.testing.assert_array_equal(
            r(x), scipy.ndimage.zoom(x, (1, 0.5, 0.5), mode="nearest")
        )

    def test_padder_roundtrip(self, rng):
        x = rng.standard_normal((5, 10, 13)).astype(np.float32)
        p = Padder("+", by=8)
        y = p(x)
        assert all(s % 8 == 0 for s in y.shape)
        np.testing.assert_array_equal(p.undo_last(y), x)

    def test_cropper_roundtrip(self, rng):
        x = rng.standard_normal((10, 19, 21)).astype(np.float32)
        c = Cropper("-", by=8)
        y = c(x)
        assert y.shape == (8, 16, 16)
        back = c.undo_last(y)
        assert back.shape == x.shape
        # cropped region preserved
        np.testing.assert_array_equal(c(back), y)

    def test_propper_switches(self):
        assert isinstance(Propper("+").transformer, Padder)
        assert isinstance(Propper("-").transformer, Cropper)

    def test_capper(self):
        x = np.array([-2.0, 0.5, 3.0])
        np.testing.assert_array_equal(Capper(-1, 1)(x), [-1, 0.5, 1])

    def test_reflection_padder(self, rng):
        x = rng.standard_normal((4, 5, 6))
        y = ReflectionPadder3d(2)(x)
        assert y.shape == (8, 9, 10)
        np.testing.assert_array_equal(y[2:6, 2:7, 2:8], x)
        np.testing.assert_array_equal(y[1], y[3])  # mirror


class TestCsvLogger:
    def test_roundtrip(self, tmp_path):
        log = CsvLogger(columns=["iter", "loss"])
        log.add({"iter": 1, "loss": 0.5})
        log.add({"iter": 2, "loss": 0.25})
        assert len(log) == 2
        p = str(tmp_path / "log.csv")
        log.to_csv(p)
        back = CsvLogger(path=p)
        assert back.data["loss"] == [0.5, 0.25]
