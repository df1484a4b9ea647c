#!/bin/sh
# Download the task datasets into the reference directory layout
# (parity: scripts/download_ndh_r2r_data.sh + tasks/CVDN/data/download.sh).
# Matterport3D connectivity JSONs and scan imagery require the Matterport3D
# terms of use: https://niessner.github.io/Matterport/
set -e

mkdir -p srv/task_data/NDH/data srv/task_data/R2R/data srv/task_data/CVDN/data

# NDH (CVDN dialog navigation)
wget https://cvdn.dev/dataset/NDH/train_val/train.json -P srv/task_data/NDH/data/
wget https://cvdn.dev/dataset/NDH/train_val/val_seen.json -P srv/task_data/NDH/data/
wget https://cvdn.dev/dataset/NDH/train_val/val_unseen.json -P srv/task_data/NDH/data/
wget https://cvdn.dev/dataset/NDH/test_cleaned/test_cleaned.json \
    -O srv/task_data/NDH/data/test.json

# R2R
wget https://www.dropbox.com/s/hh5qec8o5urcztn/R2R_train.json -P srv/task_data/R2R/data/
wget https://www.dropbox.com/s/8ye4gqce7v8yzdm/R2R_val_seen.json -P srv/task_data/R2R/data/
wget https://www.dropbox.com/s/p6hlckr70a07wka/R2R_val_unseen.json -P srv/task_data/R2R/data/
wget https://www.dropbox.com/s/w4pnbwqamwzdwd1/R2R_test.json -P srv/task_data/R2R/data/

# CVDN gameplay (question-asking classifier)
wget https://cvdn.dev/dataset/CVDN/train_val/train.json -P srv/task_data/CVDN/data/
wget https://cvdn.dev/dataset/CVDN/train_val/val_seen.json -P srv/task_data/CVDN/data/
wget https://cvdn.dev/dataset/CVDN/train_val/val_unseen.json -P srv/task_data/CVDN/data/

# R4R is generated from R2R (see github.com/google-research/google-research/tree/master/r4r);
# RxR guide annotations: gs://rxr-data/ (rxr_train_guide.jsonl.gz) -> srv/task_data/RxR/data/
echo "done"
