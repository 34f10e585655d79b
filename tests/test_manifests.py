"""Vendored data-manifest integrity + full split-pipeline oracle parity.

The 12 CSV manifests under data/csvs/ are part of the reference deliverable
(reference: data/csvs/*.csv; schema at e.g. data/csvs/dna.csv:1). These tests
run the complete offline dataset cadence (scripts/dataset/split_train_set.sh
0.75 -> split_val_set.sh 0.9 -> make_dna_dataset.sh 54/6/20) on the vendored
manifests and, when the reference checkout is present, byte-diff every
produced CSV against the output of the reference's own scripts
(scripts/python/{split_dataset,split_dataset_val,make_dataset}.py).
"""

import os
import shutil
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV_DIR = os.path.join(REPO, "data", "csvs")
REF = "/root/reference"

ALL_DATASETS = [
    "alpha_tubulin", "beta_actin", "desmoplakin", "dna", "fibrillarin",
    "lamin_b1", "membrane_caax_63x", "myosin_iib", "sec61_beta",
    "st6gal1", "tom20", "zo1",
]
USED = [d for d in ALL_DATASETS if d != "dna"]
# Columns every manifest must carry (SSPdataset.py:53 asserts this subset);
# some files carry extras (fibrillarin has 10 cols, membrane_caax_63x only 3).
CORE_SCHEMA = {"path_czi", "channel_signal", "channel_target"}


def _run_our_pipeline(root):
    from repmode_tpu.data.csv_tools import make_sampled_dataset, split_dataset

    for ds in USED:
        split_dataset(os.path.join(root, f"{ds}.csv"), root,
                      train_size=0.75, names=("train", "test"))
    for ds in USED:
        split_dataset(os.path.join(root, ds, "train.csv"), root,
                      train_size=0.9, names=("train", "val"), name=ds)
    for ds_type, n in [("train", 54), ("val", 6), ("test", 20)]:
        make_sampled_dataset(root, os.path.join(root, "dna.csv"), root,
                             ds_type, USED, sample_num=n)


class TestVendoredManifests:
    def test_all_twelve_present_with_reference_row_counts(self):
        counts = {ds: len(pd.read_csv(os.path.join(CSV_DIR, f"{ds}.csv")))
                  for ds in ALL_DATASETS}
        expected = {ds: 80 for ds in ALL_DATASETS}
        expected["membrane_caax_63x"] = 51
        expected["dna"] = 720
        assert counts == expected
        assert sum(counts.values()) == 1571  # 1583 file lines - 12 headers

    def test_schema(self):
        for ds in ALL_DATASETS:
            df = pd.read_csv(os.path.join(CSV_DIR, f"{ds}.csv"))
            assert CORE_SCHEMA <= set(df.columns), ds


class TestSplitPipelineCadence:
    """Reference cadence: 80 rows -> 60/20 -> 54/6; caax 51 -> 38/13 -> 34/4;
    dna sampled 54/6/20 (make_dna_dataset.sh:7-23)."""

    @pytest.fixture(scope="class")
    def split_root(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("csvs"))
        for ds in ALL_DATASETS:
            shutil.copy(os.path.join(CSV_DIR, f"{ds}.csv"), root)
        _run_our_pipeline(root)
        return root

    def test_split_counts(self, split_root):
        def n(ds, t):
            return len(pd.read_csv(os.path.join(split_root, ds, f"{t}.csv")))

        for ds in USED:
            if ds == "membrane_caax_63x":
                assert (n(ds, "train"), n(ds, "val"), n(ds, "test")) == (34, 4, 13)
            else:
                assert (n(ds, "train"), n(ds, "val"), n(ds, "test")) == (54, 6, 20)

    def test_dna_counts(self, split_root):
        for t, expect in [("train", 54), ("val", 6), ("test", 20)]:
            df = pd.read_csv(os.path.join(split_root, "dna", f"{t}.csv"))
            assert len(df) == expect, t
            # every sampled dna row must reference an image in the matching split
            pool = pd.concat([
                pd.read_csv(os.path.join(split_root, ds, f"{t}.csv"))
                for ds in USED
            ])["path_czi"].tolist()
            assert df["path_czi"].isin(pool).all(), t

    def test_splits_are_disjoint_and_cover(self, split_root):
        for ds in USED:
            parts = [pd.read_csv(os.path.join(split_root, ds, f"{t}.csv"))
                     for t in ("train", "val", "test")]
            union = pd.concat(parts)["path_czi"]
            assert union.is_unique
            src = pd.read_csv(os.path.join(split_root, f"{ds}.csv"))["path_czi"]
            assert set(union) == set(src)

    def test_idempotent_rerun_keeps_existing(self, split_root):
        before = {}
        for ds in USED:
            p = os.path.join(split_root, ds, "train.csv")
            before[ds] = open(p, "rb").read()
        _run_our_pipeline(split_root)  # guards must keep existing splits
        for ds in USED:
            p = os.path.join(split_root, ds, "train.csv")
            assert open(p, "rb").read() == before[ds]


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "scripts", "python")),
                    reason="reference checkout not available")
class TestReferenceOracleParity:
    """Byte-diff our pipeline's CSVs against the reference scripts' output."""

    @pytest.fixture(scope="class")
    def both_roots(self, tmp_path_factory):
        ours = str(tmp_path_factory.mktemp("ours"))
        theirs = str(tmp_path_factory.mktemp("theirs"))
        for root in (ours, theirs):
            for ds in ALL_DATASETS:
                shutil.copy(os.path.join(CSV_DIR, f"{ds}.csv"), root)
        _run_our_pipeline(ours)

        py = sys.executable
        sp = os.path.join(REF, "scripts", "python")

        def run(script, *argv):
            subprocess.run([py, os.path.join(sp, script), *argv],
                           check=True, capture_output=True, text=True)

        for ds in USED:
            run("split_dataset.py", os.path.join(theirs, f"{ds}.csv"), theirs,
                "--train_size", "0.75")
        for ds in USED:
            run("split_dataset_val.py", os.path.join(theirs, ds, "train.csv"),
                theirs, "--train_size", "0.9")
        for t, n in [("train", 54), ("val", 6), ("test", 20)]:
            run("make_dataset.py", theirs, os.path.join(theirs, "dna.csv"),
                theirs, t, "--sample_num", str(n))
        return ours, theirs

    def test_every_csv_identical(self, both_roots):
        ours, theirs = both_roots
        produced = []
        for dirpath, _, files in os.walk(theirs):
            for f in files:
                if f.endswith(".csv") and dirpath != theirs:
                    produced.append(os.path.relpath(os.path.join(dirpath, f),
                                                    theirs))
        assert len(produced) == 11 * 3 + 3  # 11 datasets x train/val/test + dna
        for rel in sorted(produced):
            a = open(os.path.join(ours, rel), "rb").read()
            b = open(os.path.join(theirs, rel), "rb").read()
            assert a == b, f"mismatch vs reference oracle: {rel}"
