#!/usr/bin/env bash
# Test-only evaluation of a saved checkpoint.
# Usage: bash scripts/run/only_eval.sh [MODEL] [EXP_DIR] [MODEL_PATH]
MODEL_NAME=${1:-RepMode}
EXP_NAME=${2:-exps/test}
MODEL_PATH=${3:-exps/test/checkpoints/model_best_test}

python -m repmode_tpu.cli.evaluate \
       --nn_module "${MODEL_NAME}" \
       --path_exp_dir "${EXP_NAME}" \
       --path_load_model "${MODEL_PATH}" \
       --path_load_dataset data/all_data \
       "${@:4}"
