#!/usr/bin/env bash
# Synthesize the 'dna' task (54/6/20 samples) from the other 11 datasets —
# every image carries a DNA channel annotation.
python - <<'PY'
from repmode_tpu.data.csv_tools import make_sampled_dataset
USED = ["alpha_tubulin", "beta_actin", "desmoplakin", "fibrillarin",
        "lamin_b1", "membrane_caax_63x", "myosin_iib", "sec61_beta",
        "st6gal1", "tom20", "zo1"]
for ds_type, n in [("train", 54), ("val", 6), ("test", 20)]:
    make_sampled_dataset("data/csvs", "data/csvs/dna.csv", "data/csvs",
                         ds_type, USED, sample_num=n)
PY
