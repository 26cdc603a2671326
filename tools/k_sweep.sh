#!/usr/bin/env bash
# Neighbour-selection sweep (BASELINE.json config 4): evaluate with K=4/8/16
# cross-references. Usage: tools/k_sweep.sh <dataset_root> [ckpt] [extra overrides...]
set -euo pipefail

data_root=${1:?usage: k_sweep.sh <dataset_root> [ckpt] [overrides...]}
ckpt=${2:-null}
shift || true; shift || true

for K in 4 8 16; do
  python -m crossscore_tpu.tasks.test \
    data.dataset.path=[$data_root] \
    trainer.ckpt_path_to_load=$ckpt \
    data.neighbour_config.cross=$K \
    alias=K$K "$@"
done
