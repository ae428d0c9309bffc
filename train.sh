#!/usr/bin/env sh
# Train the flagship pipeline (reference train.sh equivalent).
# Usage: ./train.sh               start a NEW run named "flagship"
#        ./train.sh <exp_dir>     RESUME the named experiment directory
python main.py -n "${1:-flagship}" ${1:+--resume} train
