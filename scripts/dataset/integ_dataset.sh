#!/usr/bin/env bash
# Ingest CZIs -> npz store; doubles as a pipeline smoke test (num_epochs 0).
python -m repmode_tpu.cli.train \
       --path_exp_dir exps/integ_dataset \
       --path_dataset_csv data/csvs \
       --path_dataset_czi data \
       --path_save_dataset data/all_data \
       --num_epochs 0
