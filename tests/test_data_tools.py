"""CSV split tooling, ingest transforms, store round-trip, sampler behavior."""

import os

import numpy as np
import pandas as pd
import pytest

from repmode_tpu.data.csv_tools import make_sampled_dataset, split_dataset
from repmode_tpu.data.ingest import normalize, resize
from repmode_tpu.data.sampler import PatchSampler, random_crop_flip
from repmode_tpu.data.store import VolumeStore
from repmode_tpu.data.synthetic import synthetic_store


class TestCsvTools:
    def test_split_sizes_and_determinism(self, tmp_path):
        df = pd.DataFrame({
            "path_czi": [f"data/x/{i}.czi" for i in range(20)],
            "channel_signal": 3, "channel_target": 1,
        })
        src = tmp_path / "mytask.csv"
        df.to_csv(src, index=False)
        a, b = split_dataset(str(src), str(tmp_path / "out"), train_size=0.75)
        assert len(a) == 15 and len(b) == 5
        # deterministic for a fixed seed
        a2 = pd.read_csv(tmp_path / "out" / "mytask" / "train.csv")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), a2)
        # rerun keeps existing split (returns None)
        assert split_dataset(str(src), str(tmp_path / "out")) is None

    def test_make_sampled_dataset(self, tmp_path):
        # two source tasks with split CSVs + a 'dna' source listing all images
        rows = [f"data/img_{i}.czi" for i in range(12)]
        for ds, subset in [("t1", rows[:6]), ("t2", rows[6:])]:
            d = tmp_path / "splits" / ds
            os.makedirs(d)
            pd.DataFrame({"path_czi": subset, "channel_signal": 3}).to_csv(
                d / "train.csv", index=False
            )
        dna = pd.DataFrame({"path_czi": rows, "channel_signal": 3, "channel_target": 5})
        dna_src = tmp_path / "dna.csv"
        dna.to_csv(dna_src, index=False)

        out = make_sampled_dataset(
            str(tmp_path / "splits"), str(dna_src), str(tmp_path / "out"),
            "train", used_ds=["t1", "t2"], sample_num=5,
        )
        assert len(out) == 5
        assert set(out.path_czi).issubset(set(rows))
        assert "channel_target" in out.columns


class TestIngestTransforms:
    def test_normalize_float64_zscore(self, rng):
        x = rng.integers(0, 4096, (4, 6, 6)).astype(np.uint16)
        y = normalize(x)
        assert y.dtype == np.float64
        np.testing.assert_allclose(y.mean(), 0, atol=1e-12)
        np.testing.assert_allclose(y.std(), 1, rtol=1e-12)

    def test_resize_matches_scipy(self, rng):
        scipy = pytest.importorskip("scipy")
        import scipy.ndimage

        x = rng.standard_normal((4, 20, 20))
        ours = resize(x, (1, 0.37241, 0.37241))
        ref = scipy.ndimage.zoom(x, (1, 0.37241, 0.37241), mode="nearest")
        np.testing.assert_array_equal(ours, ref)
        assert ours.shape == (4, 7, 7)


class TestStore:
    def test_npz_roundtrip(self, tmp_path):
        store = synthetic_store(("a", "b"), volumes_per_task=1, vol_shape=(8, 12, 12))
        store.save(str(tmp_path), "train")
        loaded = VolumeStore.load(str(tmp_path), "train")
        assert len(loaded) == len(store)
        assert loaded.adopted_datasets == store.adopted_datasets
        for a, b in zip(store.records, loaded.records):
            np.testing.assert_allclose(a.signal, b.signal, rtol=1e-6)
            np.testing.assert_allclose(a.target, b.target, rtol=1e-6)
            assert a.task == b.task and a.dataset == b.dataset

    def test_filter_datasets(self):
        store = synthetic_store(("a", "b"), volumes_per_task=2, vol_shape=(8, 12, 12))
        only_a = store.filter_datasets(["a"])
        assert len(only_a) == 2
        assert all(r.dataset == "a" for r in only_a.records)


class TestSampler:
    def test_crop_and_flip_shapes(self, rng):
        s = rng.standard_normal((16, 32, 32)).astype(np.float32)
        t = s * 2
        cs, ct = random_crop_flip(s, t, (8, 16, 16), rng)
        assert cs.shape == (8, 16, 16)
        np.testing.assert_allclose(ct, cs * 2)  # same crop+flip on both

    def test_epoch_visits_every_volume_once(self):
        store = synthetic_store(("a", "b"), volumes_per_task=3, vol_shape=(8, 16, 16))
        sampler = PatchSampler(store, batch_size=4, patch_size=(8, 16, 16), prefetch=0)
        batches = list(sampler.epoch())
        n = sum(b["task"].shape[0] for b in batches)
        assert n == len(store) == 6
        assert batches[0]["signal"].shape == (4, 8, 16, 16, 1)
        assert batches[-1]["signal"].shape[0] == 2  # ragged tail kept

    def test_pad_tail_static_shape(self):
        store = synthetic_store(("a", "b"), volumes_per_task=3, vol_shape=(8, 16, 16))
        sampler = PatchSampler(store, batch_size=4, patch_size=(8, 16, 16), prefetch=0)
        batches = list(sampler.epoch(pad_tail_to_batch=True))
        assert all(b["signal"].shape[0] == 4 for b in batches)

    def test_prefetch_matches_sync(self):
        store = synthetic_store(("a",), volumes_per_task=4, vol_shape=(8, 16, 16))
        s1 = PatchSampler(store, 2, (8, 16, 16), seed=7, prefetch=0)
        s2 = PatchSampler(store, 2, (8, 16, 16), seed=7, prefetch=2)
        for b1, b2 in zip(s1.epoch(), s2.epoch()):
            np.testing.assert_array_equal(b1["signal"], b2["signal"])
            np.testing.assert_array_equal(b1["task"], b2["task"])


class TestStoreFiltering:
    def test_load_with_subset_filters(self, tmp_path):
        """Loading a multi-task manifest with a filtered dataset list keeps
        only matching volumes (Multi-Net baseline workflow)."""
        store = synthetic_store(("a", "b", "c"), volumes_per_task=2, vol_shape=(8, 12, 12))
        store.save(str(tmp_path), "train")
        only_b = VolumeStore.load(str(tmp_path), "train", adopted_datasets=("b",))
        assert len(only_b) == 2
        assert all(r.dataset == "b" and r.task == 0 for r in only_b.records)
