#!/usr/bin/env sh
# Evaluate an experiment's model_best over the test split (reference test.sh).
# Usage: ./test.sh <experiment_dir_name>
python main.py -n "$1" --resume test
