#!/usr/bin/env bash
# Full experiment: train + periodic val + best-checkpoint test.
# Usage: bash scripts/run/train_and_eval.sh [MODEL] [EXP_DIR]
# (the reference's GPU index argument is obsolete: device selection is
#  automatic; use --num_devices for data parallelism)
MODEL_NAME=${1:-RepMode}
EXP_NAME=${2:-exps/test}

python -m repmode_tpu.cli.train \
       --nn_module "${MODEL_NAME}" \
       --path_exp_dir "${EXP_NAME}" \
       --path_load_dataset data/all_data \
       --num_epochs 1000 \
       --batch_size 8 \
       --lr 0.0001 \
       --interval_val 20 \
       "${@:3}"
