#!/usr/bin/env sh
# Resume training the flagship experiment (reference train.sh equivalent).
# Usage: ./train.sh [<experiment_dir_name>]
python main.py -n "${1:-flagship}" ${1:+--resume} train
