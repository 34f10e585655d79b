#!/usr/bin/env bash
# 0.75 train / 0.25 test split per dataset (seed 42).
for name in beta_actin myosin_iib membrane_caax_63x desmoplakin sec61_beta \
            st6gal1 fibrillarin lamin_b1 alpha_tubulin tom20 zo1; do
  python - "$name" <<'PY'
import sys
from repmode_tpu.data.csv_tools import split_dataset
split_dataset(f"data/csvs/{sys.argv[1]}.csv", "data/csvs", train_size=0.75,
              names=("train", "test"))
PY
done
