#!/usr/bin/env bash
# 0.9 train / 0.1 val split of each dataset's train CSV (seed 42).
for name in beta_actin myosin_iib membrane_caax_63x desmoplakin sec61_beta \
            st6gal1 fibrillarin lamin_b1 alpha_tubulin tom20 zo1; do
  python - "$name" <<'PY'
import sys
from repmode_tpu.data.csv_tools import split_dataset
split_dataset(f"data/csvs/{sys.argv[1]}/train.csv", "data/csvs",
              train_size=0.9, names=("train", "val"), name=sys.argv[1])
PY
done
